package graft.cef

import scala.collection.mutable

/** A forecast interval, relative to the emitting state's position: "a full
  * match will complete between `start` and `end` events from now"
  * (reference model/forecaster/Forecast + model/waitingTime/WtDistribution
  * .scala Forecast fields).
  *
  * `positive` is meaningful for the classification methods; interval methods
  * leave it true when a valid interval was found.
  */
final case class ForecastInterval(
    start: Int,
    end: Int,
    middle: Double,
    prob: Double,
    positive: Boolean = true) {
  def isValid: Boolean = start != -1
}

object ForecastInterval {
  val invalid: ForecastInterval = ForecastInterval(-1, -1, -1.0, -1.0, positive = false)
}

sealed trait ForecastMethod
object ForecastMethod {
  case object Argmax extends ForecastMethod
  case object FullScan extends ForecastMethod
  case object SmartScan extends ForecastMethod
  case object FixedSpread extends ForecastMethod
  case object ClassifyNextK extends ForecastMethod
  case object ClassifyWin extends ForecastMethod
}

/** Waiting-time distribution: wt(t) = P(first full-match completion exactly
  * t events from now), t = 1..horizon (reference model/waitingTime/
  * WtDistribution.scala:98-460). The six forecast-interval builders follow
  * the reference's algorithms; FULLSCAN is the exhaustive oracle the others
  * are tested against.
  */
final case class WtDistribution(wt: Map[Int, Double]) {

  def isEmpty: Boolean = wt.isEmpty
  def horizon: Int = if (wt.isEmpty) 0 else wt.keys.max
  def apply(t: Int): Double = wt.getOrElse(t, 0.0)

  private def sliceProb(s: Int, e: Int): Double =
    (s to e).map(apply).sum

  /** E[t | s <= t <= e] under the distribution restricted to [s,e]. */
  def conditionalExpectation(s: Int, e: Int): Double = {
    val mass = sliceProb(s, e)
    if (mass == 0.0) (s + e) / 2.0
    else (s to e).map(t => t * apply(t)).sum / mass
  }

  def build(method: ForecastMethod, threshold: Double, spread: Int, center: Int = 0): ForecastInterval = {
    if (isEmpty) ForecastInterval.invalid
    else method match {
      case ForecastMethod.Argmax        => argmax(threshold, spread)
      case ForecastMethod.FullScan      => fullScan(threshold, spread)
      case ForecastMethod.SmartScan     => smartScan(threshold, spread)
      case ForecastMethod.FixedSpread   => fixedSpread(threshold, spread)
      case ForecastMethod.ClassifyNextK => classifyNextK(threshold, spread)
      case ForecastMethod.ClassifyWin   => classifyWin(center, threshold, spread)
    }
  }

  /** Positive iff P(hit within the next k events) ≥ θ
    * (reference getClassNextKForecast:186-207 — the method the RTCEF loop
    * optimizes MCC over).
    */
  def classifyNextK(threshold: Double, k: Int): ForecastInterval = {
    val p = wt.filter(_._1 <= k).values.sum
    ForecastInterval(1, k, conditionalExpectation(1, k), p, positive = p >= threshold)
  }

  /** Window of length `len` centered on `center` (reference :159-184). */
  def classifyWin(center: Int, threshold: Double, len: Int): ForecastInterval = {
    val left = math.max(1, center - len / 2)
    val right = center + len / 2
    val p = wt.filter(x => x._1 >= left && x._1 <= right).values.sum
    ForecastInterval(left, right, conditionalExpectation(left, right), p, positive = p >= threshold)
  }

  /** Best window of exactly `spread` width with prob > θ (reference :209-248). */
  def fixedSpread(threshold: Double, spread: Int): ForecastInterval = {
    val h = horizon
    var best = ForecastInterval.invalid
    var s = 1
    while (s + spread <= h) {
      val e = s + spread
      val p = sliceProb(s, e)
      if (p > threshold && p > best.prob)
        best = ForecastInterval(s, e, conditionalExpectation(s, e), p)
      s += 1
    }
    best
  }

  /** Grow an interval outward from the argmax point until θ is reached
    * (reference getForecastArgMax:249-283); invalid if the needed spread
    * exceeds maxSpread.
    */
  def argmax(threshold: Double, maxSpread: Int): ForecastInterval = {
    val h = horizon
    var maxprob = 0.0
    var maxi = 0
    (1 to h).foreach { t => if (apply(t) > maxprob) { maxprob = apply(t); maxi = t } }
    var left = maxi
    var right = maxi
    var area = maxprob
    var exhausted = false
    // one side per iteration — take the higher-probability neighbor and
    // re-check the threshold after each single-step extension, so the
    // interval never overshoots θ by a double expansion (reference
    // getForecastArgMax expands largest-probability-first).
    while (area < threshold && !exhausted) {
      val nl = left - 1
      val nr = right + 1
      val pl = if (wt.contains(nl)) apply(nl) else -1.0
      val pr = if (wt.contains(nr)) apply(nr) else -1.0
      if (pl < 0.0 && pr < 0.0) exhausted = true
      else if (pr > pl) { area += pr; right = nr }
      else { area += pl; left = nl }
    }
    if (maxSpread >= right - left) ForecastInterval(left, right, maxi.toDouble, area)
    else ForecastInterval.invalid
  }

  /** Two-pointer scan for the smallest interval with prob ≥ θ
    * (reference getForecastSmartScan:315-360, VLDBJ'22 Alg.). Ties broken
    * by higher probability.
    */
  def smartScan(threshold: Double, maxSpread: Int): ForecastInterval = {
    val h = horizon
    var bestS = -1
    var bestE = -1
    var bestP = 0.0
    var s = 1
    var e = 0
    var p = 0.0
    while (e < h) {
      // expand
      while (p < threshold && e < h) { e += 1; p += apply(e) }
      if (p < threshold) {
        // distribution exhausted without reaching threshold
        e = h + 1 // terminate
      } else {
        // shrink
        while (p - apply(s) >= threshold && s < e) { p -= apply(s); s += 1 }
        val spread = e - s
        if (bestS == -1 || spread < bestE - bestS || (spread == bestE - bestS && p > bestP)) {
          bestS = s; bestE = e; bestP = p
        }
        // move on
        p -= apply(s); s += 1
      }
    }
    if (bestS != -1 && bestE - bestS <= maxSpread)
      ForecastInterval(bestS, bestE, conditionalExpectation(bestS, bestE), bestP)
    else ForecastInterval.invalid
  }

  /** Exhaustive search: smallest spread first, then highest probability —
    * the testing oracle (reference getForecastFullScan:436-460).
    */
  def fullScan(threshold: Double, maxSpread: Int): ForecastInterval = {
    val h = horizon
    for (spread <- 0 to math.min(maxSpread, h - 1)) {
      var best = ForecastInterval.invalid
      for (s <- 1 to h - spread) {
        val e = s + spread
        val p = sliceProb(s, e)
        if (p >= threshold && p > best.prob)
          best = ForecastInterval(s, e, conditionalExpectation(s, e), p)
      }
      if (best.isValid) return best
    }
    ForecastInterval.invalid
  }
}

/** F7: alternative forecasters (reference model/forecaster/NextInterface,
  * RandomInterface — baselines the SPST path is compared against; the HMM
  * variant needs the smile library and is out of scope).
  */
object Baselines {

  /** Next-symbol forecaster: positive iff the probability that the very
    * next transition reaches a final state exceeds the threshold. */
  def nextForecast(
      spst: Spst,
      label: List[Int],
      sdfaState: Int,
      threshold: Double): ForecastInterval = {
    val pHit = (0 until spst.sdfa.iso.size).map { sym =>
      val p = spst.pst.condProbFor(sym, label)
      if (spst.sdfa.isFinal(spst.sdfa.delta(sdfaState)(sym))) p else 0.0
    }.sum
    ForecastInterval(1, 1, 1.0, pHit, positive = pHit >= threshold)
  }

  /** Seeded random-interval baseline (reference RandomInterface). */
  final class RandomForecaster(horizon: Int, spread: Int, seed: Long = 42L) extends Serializable {
    private val rnd = new scala.util.Random(seed)
    def next(): ForecastInterval = {
      val start = 1 + rnd.nextInt(math.max(1, horizon - spread))
      ForecastInterval(start, start + spread, (2 * start + spread) / 2.0,
        rnd.nextDouble(), positive = rnd.nextBoolean())
    }
  }
}

/** Full-order Markov chain over SDFA states with MLE-estimated transitions
  * (reference model/markov/MarkovChain.scala:58-330 + estimator/
  * MatrixEstimator/MLEEstimator.scala:26-160). For order 0 the chain embeds
  * directly on SDFA states; higher orders require the disambiguated SDFA.
  */
final case class MarkovChain(
    nStates: Int,
    probs: Array[Array[Double]],
    finals: Set[Int]) {

  /** wt_s(t) = P(first visit to a final state at exactly step t | start s),
    * computed by iterated one-step expansion over non-final mass — the same
    * recursion as the reference's fundamental-matrix formulation
    * (MarkovChain.scala:138-330) without the matrix inversion.
    */
  def wtDistribution(from: Int, horizon: Int): WtDistribution = {
    var mass = Array.tabulate(nStates)(i => if (i == from) 1.0 else 0.0)
    val wt = mutable.Map.empty[Int, Double]
    var t = 1
    while (t <= horizon) {
      val next = new Array[Double](nStates)
      var hit = 0.0
      var i = 0
      while (i < nStates) {
        val m = mass(i)
        if (m > 0) {
          val row = probs(i)
          var j = 0
          while (j < nStates) {
            val p = m * row(j)
            if (p > 0) {
              if (finals.contains(j)) hit += p
              else next(j) += p
            }
            j += 1
          }
        }
        i += 1
      }
      wt(t) = hit
      mass = next
      t += 1
    }
    WtDistribution(wt.toMap)
  }
}

object MarkovChain {

  /** T6 (RemainingTime estimator): expected number of events until the
    * first final-state visit, per state — solved iteratively from
    * h = 1 + Q·h over non-final states (reference estimator/
    * RemainingTimeEstimator). States that cannot reach a final get
    * Double.PositiveInfinity.
    */
  def expectedHittingTime(mc: MarkovChain, iterations: Int = 10000, tol: Double = 1e-12): Array[Double] = {
    val n = mc.nStates
    // U = states that cannot reach a final (a closed set: leaving U would
    // contradict membership). E[hit | i] is infinite iff i can reach U
    // with positive probability — detected structurally; value iteration
    // alone would crawl to ~#iterations and look plausibly finite.
    val canHit = Array.fill(n)(false)
    mc.finals.foreach(f => canHit(f) = true)
    var grew = true
    while (grew) {
      grew = false
      var i = 0
      while (i < n) {
        if (!canHit(i)) {
          var j = 0
          while (j < n) {
            if (mc.probs(i)(j) > 0 && canHit(j)) { canHit(i) = true; grew = true }
            j += 1
          }
        }
        i += 1
      }
    }
    val canReachU = Array.tabulate(n)(i => !canHit(i))
    grew = true
    while (grew) {
      grew = false
      var i = 0
      while (i < n) {
        if (!canReachU(i) && !mc.finals.contains(i)) {
          var j = 0
          while (j < n) {
            if (mc.probs(i)(j) > 0 && canReachU(j)) { canReachU(i) = true; grew = true }
            j += 1
          }
        }
        i += 1
      }
    }
    val finite = Array.tabulate(n)(i => mc.finals.contains(i) || !canReachU(i))
    val h = Array.tabulate(n)(i => if (finite(i)) 0.0 else Double.PositiveInfinity)
    var it = 0
    var delta = Double.MaxValue
    while (it < iterations && delta > tol) {
      delta = 0.0
      var i = 0
      while (i < n) {
        if (!mc.finals.contains(i) && finite(i)) {
          var v = 1.0
          var j = 0
          while (j < n) {
            // finite states never transition into U, so all non-final mass
            // stays within the finite subchain
            if (!mc.finals.contains(j) && finite(j)) v += mc.probs(i)(j) * h(j)
            j += 1
          }
          delta = math.max(delta, math.abs(v - h(i)))
          h(i) = v
        }
        i += 1
      }
      it += 1
    }
    h
  }

  /** MLE from (state, nextState) transition counts
    * (reference MLEEstimator.scala:26-160): row-normalized counts; rows
    * with no observations fall back to a self-loop.
    */
  def mle(nStates: Int, counts: Iterable[((Int, Int), Long)], finals: Set[Int]): MarkovChain = {
    val m = Array.fill(nStates, nStates)(0.0)
    counts.foreach { case ((i, j), c) => m(i)(j) += c.toDouble }
    var i = 0
    while (i < nStates) {
      val rowSum = m(i).sum
      if (rowSum == 0) m(i)(i) = 1.0
      else { var j = 0; while (j < nStates) { m(i)(j) /= rowSum; j += 1 } }
      i += 1
    }
    MarkovChain(nStates, m, finals)
  }
}
