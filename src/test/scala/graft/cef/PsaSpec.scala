package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** T4/T6 specs: PST ≡ PSA predictions (reference Specs/vmm), and order
  * selection recovering the true order of synthetic sources.
  */
class PsaSpec extends AnyFlatSpec with Matchers {

  private val rnd = new Random(31)

  private def cstOf(stream: Seq[Int], maxLen: Int): Cst = {
    val cst = new Cst
    val buf = new SymbolBuffer(maxLen)
    stream.foreach { s => buf.push(s); cst.add(buf.pop) }
    cst
  }

  "a PSA built from a PST" should "make identical next-symbol predictions" in {
    for (_ <- 1 to 10) {
      // markov-1 source with random transition matrix over {0,1}
      val p01 = 0.2 + 0.6 * rnd.nextDouble()
      val p11 = 0.2 + 0.6 * rnd.nextDouble()
      val stream = scala.collection.mutable.ArrayBuffer(0)
      while (stream.size < 800)
        stream += (if (rnd.nextDouble() < (if (stream.last == 0) p01 else p11)) 1 else 0)
      val cst = cstOf(stream.toSeq, 3)
      val pst = PstLearner.learn(cst, 2, pMin = 0.001, alpha = 0.05, gammaMin = 0.001, r = 1.05)
      val alphabet = cst.symbols
      val psa = Psa.fromPst(pst, alphabet)

      // after compatibilization, every (state, σ) walk lands on a leaf and
      // PSA transition probs equal the PST conditional at the state label
      (0 until psa.nStates).foreach { s =>
        alphabet.foreach { sym =>
          psa.prob(s, sym) shouldBe pst.condProbFor(sym, psa.labels(s)) +- 1e-12
        }
      }

      // walking a random word: after a tree-depth warm-up the PSA state
      // tracks the PST context exactly
      var state = psa.deepestStateFor(List(stream.last))
      val warmup = Seq.fill(5)(rnd.nextInt(2))
      var ctx = List(stream.last)
      warmup.foreach { sym => state = psa.step(state, sym); ctx = sym :: ctx }
      val word = Seq.fill(50)(rnd.nextInt(2))
      word.foreach { sym =>
        val pstProb = pst.condProbFor(sym, pst.nodeFor(ctx).label)
        // PSA label is a suffix of the full context → same distribution node
        psa.prob(state, sym) shouldBe pstProb +- 1e-12
        state = psa.step(state, sym)
        ctx = sym :: ctx
      }
    }
  }

  it should "handle the single-state memoryless case" in {
    val stream = Seq.fill(500)(rnd.nextInt(2))
    val cst = cstOf(stream, 2)
    val pst = PstLearner.learn(cst, 1, pMin = 0.01, alpha = 0.5, gammaMin = 0.01, r = 1.5)
    val psa = Psa.fromPst(pst, cst.symbols)
    if (psa.nStates == 1) {
      psa.step(0, 0) shouldBe 0
      psa.step(0, 1) shouldBe 0
    }
    (psa.prob(0, 0) + psa.prob(0, 1)) shouldBe 1.0 +- 1e-9
  }

  "order selection" should "recover the order of a deterministic order-2 source" in {
    // symbol = XOR of previous two: needs order 2, order 1 insufficient
    val buf = scala.collection.mutable.ArrayBuffer(0, 1)
    while (buf.size < 1500) buf += (buf(buf.size - 1) ^ buf(buf.size - 2))
    val (best, losses) = OrderEstimator.selectOrder(buf.toSeq, maxOrder = 3)
    best should be >= 2
    losses(2) should be < losses(0)
    losses(2) should be < losses(1)
  }

  it should "not overfit a memoryless source to high orders" in {
    val stream = Seq.fill(2000)(if (rnd.nextDouble() < 0.7) 1 else 0)
    val (best, losses) = OrderEstimator.selectOrder(stream, maxOrder = 3)
    // the iid source gains nothing from context: losses near-equal, and the
    // selected order's loss is within noise of order 0
    losses(best) shouldBe losses(0) +- 0.02
  }

  "the SPSA embedding" should "carry the SDFA language and the PSA probabilities in one automaton" in {
    val cp = Compiler.compile(";(IsEventTypePredicate(a),IsEventTypePredicate(b))")
    val rnd2 = new Random(17)
    val types = Vector("a", "b", "c")
    val syms = (1 to 600).map(i => cp.iso.evaluate(CEvent.simple(i.toLong, types(rnd2.nextInt(3)), i.toLong)))
    val order = 2
    val cst = cstOf(syms, order + 1)
    // two identical learns: fromPst mutates its tree (compatibility splits)
    val pstSpst = PstLearner.learn(cst, order, 0.001, 0.05, 0.001, 1.05)
    val pstPsa = PstLearner.learn(cst, order, 0.001, 0.05, 0.001, 1.05)
    val spst = Spst(cp.sdfa, pstSpst, order)
    val psa = Psa.fromPst(pstPsa, cst.symbols)
    val spsa = Spsa.build(cp.sdfa, psa)

    // structural: every transition pairs the SDFA delta with the PSA step
    spsa.states.zipWithIndex.foreach { case ((q, p), s) =>
      psa.next(p).keys.foreach { sym =>
        spsa.states(spsa.step(s, sym)) shouldBe
          ((cp.sdfa.delta(q)(sym), psa.step(p, sym)))
        spsa.prob(s, sym) shouldBe psa.prob(p, sym)
      }
    }

    // replay the stream; at checkpoints the SPSA's waiting-time
    // distribution must equal the SPST's (same model, embedded form);
    // cutoff 0 on both so path pruning cannot differ across the two
    // state aggregations
    var q = cp.sdfa.start
    var ctx = List.empty[Int]
    val maxLabel = psa.labels.map(_.length).max
    var checked = 0
    syms.zipWithIndex.foreach { case (s, i) =>
      q = cp.sdfa.delta(q)(s)
      ctx = s :: ctx
      if (i >= maxLabel && i % 37 == 0) {
        val lbl = pstSpst.nodeFor(ctx.take(order)).label
        val wtS = spst.wtDistribution(lbl, q, horizon = 15, cutoff = 0.0)
        val wtP = spsa.wtDistribution(spsa.stateFor(ctx, q), horizon = 15)
        (1 to 15).foreach(t => wtP(t) shouldBe wtS(t) +- 1e-9)
        checked += 1
      }
    }
    checked should be > 10
  }
}
