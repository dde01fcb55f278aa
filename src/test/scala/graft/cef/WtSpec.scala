package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** Waiting-time distribution specs, mirroring the reference's brute-force
  * check (Specs/model/waitingTime/WaitingTimeSpec.scala): wt distributions
  * computed by the engine must equal exhaustive path enumeration, and every
  * interval builder must agree with the exhaustive FULLSCAN oracle.
  */
class WtSpec extends AnyFlatSpec with Matchers {

  private val rnd = new Random(13)

  private def randomChain(n: Int, finals: Set[Int]): MarkovChain = {
    val m = Array.fill(n, n)(0.0)
    for (i <- 0 until n) {
      val raw = Array.fill(n)(rnd.nextDouble())
      val s = raw.sum
      for (j <- 0 until n) m(i)(j) = raw(j) / s
    }
    MarkovChain(n, m, finals)
  }

  /** Brute force: enumerate all state paths of length h, accumulate the
    * probability of first final visit at each step. */
  private def bruteWt(mc: MarkovChain, from: Int, h: Int): Map[Int, Double] = {
    val wt = scala.collection.mutable.Map.empty[Int, Double].withDefaultValue(0.0)
    def go(state: Int, t: Int, p: Double): Unit =
      if (t <= h) {
        for (j <- 0 until mc.nStates) {
          val p2 = p * mc.probs(state)(j)
          if (p2 > 0) {
            if (mc.finals.contains(j)) wt(t) += p2
            else go(j, t + 1, p2)
          }
        }
      }
    go(from, 1, 1.0)
    wt.toMap
  }

  "MarkovChain wt distributions" should "match brute-force path enumeration" in {
    for (_ <- 1 to 10) {
      val mc = randomChain(4, Set(3))
      val h = 6
      for (s <- 0 until 4) {
        val wt = mc.wtDistribution(s, h)
        val brute = bruteWt(mc, s, h)
        (1 to h).foreach { t => wt(t) shouldBe brute.getOrElse(t, 0.0) +- 1e-12 }
      }
    }
  }

  it should "sum to ~1 over a long horizon for an ergodic chain" in {
    val mc = randomChain(4, Set(2))
    val wt = mc.wtDistribution(0, 200)
    wt.wt.values.sum shouldBe 1.0 +- 1e-9
  }

  "expected hitting time" should "match the analytic value and the wt-distribution mean" in {
    // geometric: from state 0, hit final 1 with prob p each step → E = 1/p
    val p = 0.3
    val geo = MarkovChain(2, Array(Array(1 - p, p), Array(0.5, 0.5)), Set(1))
    MarkovChain.expectedHittingTime(geo)(0) shouldBe 1.0 / p +- 1e-9

    // random ergodic chain: E[hit] == Σ t·wt(t)
    val mc = randomChain(4, Set(3))
    val h = MarkovChain.expectedHittingTime(mc)
    val wt = mc.wtDistribution(0, 2000)
    val mean = wt.wt.map { case (t, pr) => t * pr }.sum
    h(0) shouldBe mean +- 1e-6
  }

  it should "be infinite for states that can miss the final forever" in {
    // state 2 is absorbing non-final; state 0 can fall into it
    val mc = MarkovChain(3, Array(
      Array(0.5, 0.3, 0.2),
      Array(0.0, 0.0, 1.0),
      Array(0.0, 0.0, 1.0)), Set(1))
    val h = MarkovChain.expectedHittingTime(mc)
    h(2).isPosInfinity shouldBe true
    h(0).isPosInfinity shouldBe true // reaches the dead set w.p. > 0
    h(1) shouldBe 0.0
    // a clean geometric state stays finite
    val ok = MarkovChain(2, Array(Array(0.5, 0.5), Array(0.0, 1.0)), Set(1))
    MarkovChain.expectedHittingTime(ok)(0) shouldBe 2.0 +- 1e-9
  }

  "SPST wt distributions" should "match brute-force expansion over the product space" in {
    // order-1 PST over a 2-symbol alphabet with hand-set conditionals, and a
    // tiny 3-state SDFA-like delta: 0 -sym1-> 1 -sym1-> 2(final), sym0 resets to 0
    val root = new Pst(Nil, Map(0 -> 0.5, 1 -> 0.5))
    val n0 = new Pst(List(0), Map(0 -> 0.8, 1 -> 0.2))
    val n1 = new Pst(List(1), Map(0 -> 0.3, 1 -> 0.7))
    root.children(0) = n0
    root.children(1) = n1
    val iso = Isomorphism(
      Vector(Predicate.IsEventType("x")),
      Vector(Map(Predicate.IsEventType("x") -> false), Map(Predicate.IsEventType("x") -> true)))
    val delta = Array(Array(0, 1), Array(0, 2), Array(0, 1))
    val takes = Array.fill(3, 2)(true)
    val sdfa = Sdfa(delta, takes, 0, Set(2), iso)
    val spst = Spst(sdfa, root, 1)

    def brute(label: List[Int], st: Int, h: Int): Map[Int, Double] = {
      val wt = scala.collection.mutable.Map.empty[Int, Double].withDefaultValue(0.0)
      def go(lbl: List[Int], s: Int, t: Int, p: Double): Unit =
        if (t <= h) {
          for (sym <- 0 to 1) {
            val p2 = p * root.condProbFor(sym, lbl)
            if (p2 > 0) {
              val ns = delta(s)(sym)
              if (ns == 2) wt(t) += p2
              else go(root.nodeFor(sym :: lbl).label, ns, t + 1, p2)
            }
          }
        }
      go(label, st, 1, 1.0)
      wt.toMap
    }

    for (lbl <- List(List(0), List(1)); st <- 0 to 1) {
      val wt = spst.wtDistribution(lbl, st, 5, cutoff = 0.0)
      val b = brute(lbl, st, 5)
      (1 to 5).foreach { t => wt(t) shouldBe b.getOrElse(t, 0.0) +- 1e-12 }
    }
  }

  private def randWt(h: Int): WtDistribution = {
    val raw = (1 to h).map(_ -> rnd.nextDouble() * rnd.nextDouble()).toMap
    val s = raw.values.sum / 0.95 // total mass ~0.95, like a truncated dist
    WtDistribution(raw.map { case (k, v) => k -> v / s })
  }

  "interval builders" should "have smartScan find a smallest interval reaching the threshold" in {
    for (_ <- 1 to 200) {
      val wt = randWt(3 + rnd.nextInt(15))
      val theta = 0.2 + rnd.nextDouble() * 0.6
      val h = wt.horizon
      val smart = wt.smartScan(theta, h)
      val full = wt.fullScan(theta, h)
      smart.isValid shouldBe full.isValid
      if (full.isValid) {
        // same minimal spread; probability above threshold
        (smart.end - smart.start) shouldBe (full.end - full.start)
        smart.prob should be >= theta
      }
    }
  }

  it should "have argmax produce an interval containing the argmax point with prob >= threshold when valid" in {
    for (_ <- 1 to 200) {
      val wt = randWt(3 + rnd.nextInt(15))
      val theta = 0.2 + rnd.nextDouble() * 0.5
      val f = wt.argmax(theta, wt.horizon)
      if (f.isValid) {
        val maxPoint = (1 to wt.horizon).maxBy(wt(_))
        f.start should be <= maxPoint
        f.end should be >= maxPoint
        if (f.prob < theta) {
          // only allowed when the whole distribution couldn't reach theta
          wt.wt.values.sum should be < theta + 1e-9
        }
      }
    }
  }

  it should "have classifyNextK sum the first k probabilities" in {
    val wt = WtDistribution(Map(1 -> 0.1, 2 -> 0.2, 3 -> 0.3, 4 -> 0.1))
    val f = wt.classifyNextK(0.5, 3)
    f.prob shouldBe 0.6 +- 1e-12
    f.positive shouldBe true
    wt.classifyNextK(0.7, 3).positive shouldBe false
    f.start shouldBe 1
    f.end shouldBe 3
  }

  it should "have fixedSpread pick the best window of exact width" in {
    for (_ <- 1 to 100) {
      val wt = randWt(10)
      val spread = 2
      val f = wt.fixedSpread(0.0, spread)
      // exhaustive best
      val best = (1 to wt.horizon - spread).map { s =>
        (s, (s to s + spread).map(wt(_)).sum)
      }.maxBy(_._2)
      f.start shouldBe best._1
      f.prob shouldBe best._2 +- 1e-12
    }
  }
}
