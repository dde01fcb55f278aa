package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** Scientific validation of the modeling chain: on a source with genuine
  * order-2 temporal dependence, the order-2 Markov chain on the
  * disambiguated SDFA (C8+F1) and the order-2 SPST (T1/T2+F2) must both
  * predict waiting times better than the chain on the raw SDFA — measured
  * as held-out predictive log-loss of the actual wait under each model's
  * state-conditional wt distribution. This is the entire reason RTCEF
  * disambiguates and learns variable-order models.
  */
class ForecastQualitySpec extends AnyFlatSpec with Matchers {

  private val rnd = new Random(123)

  /** Markov-2 source over {a,b,x}: after a single `a`, `b` is very likely;
    * after a DOUBLE `a`, `b` is rare. The streaming SDFA of #(;(a,b))
    * already distinguishes the last symbol structurally (the `a`-entry and
    * TRUE*-loop NFA states differ), so an order-1 refinement is a no-op —
    * but it lumps `xa` and `aa` histories, which only order-2
    * disambiguation separates.
    */
  private def genStream(n: Int): Vector[String] = {
    val out = Vector.newBuilder[String]
    var prev2 = "x"
    var prev = "x"
    for (_ <- 1 to n) {
      val r = rnd.nextDouble()
      val next = (prev2, prev) match {
        case ("a", "a")       => if (r < 0.05) "b" else if (r < 0.5) "a" else "x"
        case (_, "a")         => if (r < 0.9) "b" else if (r < 0.95) "a" else "x"
        case _                => if (r < 0.3) "a" else "x"
      }
      out += next
      prev2 = prev
      prev = next
    }
    out.result()
  }

  private def events(stream: Seq[String]): Seq[CEvent] =
    stream.zipWithIndex.map { case (t, i) => CEvent.simple(i + 1, t, i + 1) }

  it should "rank order-2 MC and SPST above the raw chain on held-out log-loss" in {
    val cp = Compiler.compile("#(;(IsEventTypePredicate(a),IsEventTypePredicate(b)))")
    val horizon = 12
    val eps = 1e-9
    val train = events(genStream(20000))
    val test = events(genStream(20000))

    def countsOf(sdfa: Sdfa, evs: Seq[CEvent]): Seq[((Int, Int), Long)] = {
      var s = sdfa.start
      evs.map { e =>
        val prev = s
        s = sdfa.next(prev, sdfa.iso.evaluate(e))
        ((prev, s), 1L)
      }.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }.toSeq
    }

    // actual waits on the held-out stream: events until next detection
    val detRun = new DetRun(cp, "")
    val detAt: Set[Int] = test.flatMap(e => detRun.step(e).map(_.counter.toInt)).toSet
    val n = test.size
    val waits: Map[Int, Int] = (1 to n).flatMap { i =>
      (i + 1 to math.min(n, i + horizon)).find(detAt.contains).map(j => i -> (j - i))
    }.toMap

    /** Mean -log wt_state(i)(wait_i) over all positions with observed waits,
      * tracking the given automaton's state along the test stream. */
    def logLoss(sdfa: Sdfa, wtOf: Int => WtDistribution): Double = {
      var s = sdfa.start
      var loss = 0.0
      var cnt = 0
      test.zipWithIndex.foreach { case (e, idx) =>
        s = sdfa.next(s, sdfa.iso.evaluate(e))
        val pos = idx + 1
        waits.get(pos).foreach { t =>
          loss -= math.log(math.max(wtOf(s)(t), eps))
          cnt += 1
        }
      }
      loss / cnt
    }

    // ---- order-0 chain on the raw SDFA
    val mc0 = MarkovChain.mle(cp.sdfa.nStates, countsOf(cp.sdfa, train), cp.sdfa.finals)
    val wt0 = (0 until cp.sdfa.nStates).map(s => s -> mc0.wtDistribution(s, horizon)).toMap
    val loss0 = logLoss(cp.sdfa, wt0)

    // ---- order-2 chain on the disambiguated SDFA
    val dis = Disambiguator.disambiguate(cp.sdfa, 2)
    val mc1 = MarkovChain.mle(dis.sdfa.nStates, countsOf(dis.sdfa, train), dis.sdfa.finals)
    val wt1 = (0 until dis.sdfa.nStates).map(s => s -> mc1.wtDistribution(s, horizon)).toMap
    val loss1 = logLoss(dis.sdfa, wt1)

    info(f"log-loss raw = $loss0%.4f, order-2 = $loss1%.4f")
    loss1 should be < loss0 - 0.01

    // ---- order-2 SPST: state = (PST context label, SDFA state)
    val cst = new Cst
    val buf = new SymbolBuffer(3)
    train.foreach { e => buf.push(cp.iso.evaluate(e)); cst.add(buf.pop) }
    val pst = PstLearner.learn(cst, 2, pMin = 0.0001, alpha = 0.05, gammaMin = 0.0001, r = 1.05)
    val spst = Spst(cp.sdfa, pst, 2)
    val wtCache = scala.collection.mutable.Map.empty[(List[Int], Int), WtDistribution]
    var s = cp.sdfa.start
    val ctx = new SymbolBuffer(2)
    var lossS = 0.0
    var cntS = 0
    test.zipWithIndex.foreach { case (e, idx) =>
      val sym = cp.iso.evaluate(e)
      ctx.push(sym)
      s = cp.sdfa.next(s, sym)
      val label = pst.nodeFor(ctx.pop).label
      waits.get(idx + 1).foreach { t =>
        val wt = wtCache.getOrElseUpdate((label, s),
          spst.wtDistribution(label, s, horizon, cutoff = 0.0))
        lossS -= math.log(math.max(wt(t), eps))
        cntS += 1
      }
    }
    val spstLoss = lossS / cntS
    info(f"log-loss spst-2 = $spstLoss%.4f")
    spstLoss should be < loss0 - 0.01
  }
}
