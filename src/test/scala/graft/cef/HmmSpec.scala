package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** HMM forecaster specs (F7): EM monotonicity, recovery of a planted
  * model's predictive power, and exactness of the joint-propagation
  * waiting-time recursion against brute-force path enumeration.
  */
class HmmSpec extends AnyFlatSpec with Matchers {

  private val rnd = new Random(17)

  /** Sample a sequence from a planted 2-state HMM. */
  private def sample(hmm: Hmm, n: Int): IndexedSeq[Int] = {
    def pick(dist: Array[Double]): Int = {
      val r = rnd.nextDouble()
      var acc = 0.0
      var i = 0
      while (i < dist.length) { acc += dist(i); if (r < acc) return i; i += 1 }
      dist.length - 1
    }
    var h = pick(hmm.pi)
    (1 to n).map { _ =>
      val o = pick(hmm.b(h))
      h = pick(hmm.a(h))
      o
    }
  }

  private val planted = Hmm(
    pi = Array(0.5, 0.5),
    a = Array(Array(0.9, 0.1), Array(0.2, 0.8)),
    b = Array(Array(0.8, 0.1, 0.1), Array(0.1, 0.1, 0.8)))

  "Baum-Welch" should "increase the likelihood monotonically" in {
    val obs = sample(planted, 2000)
    val (_, lls) = Hmm.baumWelch(obs, nStates = 2, nSymbols = 3, iterations = 15)
    lls.sliding(2).foreach { case Seq(prev, next) => next should be >= prev - 1e-9 }
  }

  it should "beat an iid model on held-out likelihood for an HMM source" in {
    val train = sample(planted, 4000)
    val test = sample(planted, 4000)
    val (learned, _) = Hmm.baumWelch(train, nStates = 2, nSymbols = 3, iterations = 25)
    val hmmLl = learned.logLikelihood(test) / test.size
    // iid baseline with empirical symbol frequencies
    val freq = (0 until 3).map(o => train.count(_ == o).toDouble / train.size)
    val iidLl = test.map(o => math.log(freq(o))).sum / test.size
    info(f"held-out per-symbol ll: hmm=$hmmLl%.4f iid=$iidLl%.4f")
    hmmLl should be > iidLl + 0.01
  }

  "the HMM waiting-time recursion" should "match brute-force path enumeration on the product space" in {
    // tiny SDFA: 0 --sym2--> 1(final), else self-loops; iso irrelevant here
    val iso = Isomorphism(
      Vector(Predicate.IsEventType("x")),
      Vector(Map(Predicate.IsEventType("x") -> false), Map(Predicate.IsEventType("x") -> true)))
    val delta = Array(Array(0, 1), Array(0, 1))
    val sdfa = Sdfa(delta, Array.fill(2, 2)(true), 0, Set(1),
      Isomorphism(iso.predicates, iso.minterms))
    val hmm = Hmm(
      pi = Array(1.0, 0.0),
      a = Array(Array(0.7, 0.3), Array(0.4, 0.6)),
      b = Array(Array(0.9, 0.1), Array(0.2, 0.8)))

    def brute(h0: Array[Double], s0: Int, horizon: Int): Map[Int, Double] = {
      val wt = scala.collection.mutable.Map.empty[Int, Double].withDefaultValue(0.0)
      def go(h: Int, s: Int, t: Int, p: Double): Unit =
        if (t <= horizon) {
          for (h2 <- 0 to 1; o <- 0 to 1) {
            val p2 = p * hmm.a(h)(h2) * hmm.b(h2)(o)
            if (p2 > 0) {
              val s2 = delta(s)(o)
              if (s2 == 1) wt(t) += p2
              else go(h2, s2, t + 1, p2)
            }
          }
        }
      for (h <- 0 to 1) if (h0(h) > 0) go(h, s0, 1, h0(h))
      wt.toMap
    }

    val b0 = Array(0.6, 0.4)
    val wt = hmm.wtDistribution(b0, sdfa, 0, 8)
    val exp = brute(b0, 0, 8)
    (1 to 8).foreach { t => wt(t) shouldBe exp.getOrElse(t, 0.0) +- 1e-12 }
    // and the filtered belief feeds it: posterior after observing symbols
    val bel = hmm.belief(Seq(0, 0, 1))
    bel.sum shouldBe 1.0 +- 1e-9
    hmm.wtDistribution(bel, sdfa, 0, 5).wt.values.sum should be <= 1.0 + 1e-9
  }

  "belief" should "use the same first-observation convention as the forward algorithm" in {
    // pi concentrated on state 0: the first observation must be scored
    // under state 0's emissions, with no transition beforehand
    val hmm = Hmm(
      pi = Array(1.0, 0.0),
      a = Array(Array(0.0, 1.0), Array(1.0, 0.0)), // deterministic alternation
      b = Array(Array(0.9, 0.1), Array(0.1, 0.9)))
    val bel1 = hmm.belief(Seq(0))
    // still in state 0 right after the first observation (no pre-transition)
    bel1(0) shouldBe 1.0 +- 1e-9
    // likelihood consistency: P(obs) from belief recursion == forward
    hmm.logLikelihood(Seq(0)) shouldBe math.log(0.9) +- 1e-9
  }
}
