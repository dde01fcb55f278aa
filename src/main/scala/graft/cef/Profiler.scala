package graft.cef

/** Classification metrics with the reference's exact conventions
  * (profiler/classification/ClassificationStatsEstimator.scala:52-85; Java
  * twin utils/Scores.java:20-80):
  *
  *  - undefined ratios are -1 (not NaN),
  *  - MCC uses the overflow-safe product-of-ratios form
  *    √(p·r·spec·npv) − √(fdr·fnr·fpr·fomr), and is 0.0 when any marginal
  *    is zero — the Observer's thresholds are tuned to these exact values.
  */
final case class ClassStats(tp: Long, tn: Long, fp: Long, fn: Long) {
  def +(o: ClassStats): ClassStats = ClassStats(tp + o.tp, tn + o.tn, fp + o.fp, fn + o.fn)

  def precision: Double = if (tp + fp != 0) tp.toDouble / (tp + fp) else -1
  def recall: Double = if (tp + fn != 0) tp.toDouble / (tp + fn) else -1
  def f1: Double =
    if (precision != -1 && recall != -1) 2 * precision * recall / (precision + recall) else -1
  def specificity: Double = if (tn + fp != 0) tn.toDouble / (tn + fp) else -1
  def accuracy: Double = {
    val total = tp + tn + fp + fn
    if (total != 0) (tp + tn).toDouble / total else -1
  }
  def npv: Double = if (tn + fn != 0) tn.toDouble / (tn + fn) else -1
  def informedness: Double =
    if (recall != -1 && specificity != -1) recall + specificity - 1 else -1

  def mcc: Double =
    if (tp + fp == 0 || tp + fn == 0 || tn + fp == 0 || tn + fn == 0) 0.0
    else {
      val p = precision; val r = recall; val s = specificity; val n = npv
      math.sqrt(p * r * s * n) - math.sqrt((1 - p) * (1 - r) * (1 - s) * (1 - n))
    }
}

/** A3: regression-style forecast evaluation — per-state interval-hit
  * statistics and error of the interval midpoint against the actual
  * waiting time (reference profiler/regression/RegressionForecastCollector
  * .scala:29-244, RegressionStatsEstimator.scala:1-312).
  */
final class RegressionCollector extends Serializable {
  import scala.collection.mutable
  private val byState = mutable.Map.empty[Int, RegressionStats]

  /** @param state          the emitting automaton state
    * @param start          interval start, relative to the emission point
    * @param end            interval end
    * @param middle         interval midpoint estimate (conditional expectation)
    * @param actualDistance events until the next detection (-1: none came)
    */
  def add(state: Int, start: Long, end: Long, middle: Double, actualDistance: Long): Unit = {
    val s = byState.getOrElseUpdate(state, RegressionStats())
    s.n += 1
    s.spreadSum += (end - start)
    if (actualDistance >= 0) {
      s.observed += 1
      if (actualDistance >= start && actualDistance <= end) s.hits += 1
      s.absErrorSum += math.abs(actualDistance - middle)
    }
  }

  def stats: Map[Int, RegressionStats] = byState.toMap
  def totals: RegressionStats =
    byState.values.foldLeft(RegressionStats()) { (a, b) =>
      RegressionStats(a.n + b.n, a.hits + b.hits, a.observed + b.observed,
        a.spreadSum + b.spreadSum, a.absErrorSum + b.absErrorSum)
    }
}

final case class RegressionStats(
    var n: Long = 0, var hits: Long = 0, var observed: Long = 0,
    var spreadSum: Long = 0, var absErrorSum: Double = 0.0) {
  def hitRate: Double = if (observed == 0) -1 else hits.toDouble / observed
  def avgSpread: Double = if (n == 0) -1 else spreadSum.toDouble / n
  def meanAbsError: Double = if (observed == 0) -1 else absErrorSum / observed
}

object Profiler {

  /** Evaluate one forecast against a key's detection counters (reference
    * ClassificationForecastCollector.evaluateForecast:104-150): tp iff
    * positive ∧ ∃ detection counter in [start, end]; tn/fp/fn accordingly.
    */
  def evaluate(positive: Boolean, start: Long, end: Long, detections: Seq[Long]): ClassStats = {
    val hit = detections.exists(d => d >= start && d <= end)
    (positive, hit) match {
      case (true, true)   => ClassStats(1, 0, 0, 0)
      case (false, false) => ClassStats(0, 1, 0, 0)
      case (true, false)  => ClassStats(0, 0, 1, 0)
      case (false, true)  => ClassStats(0, 0, 0, 1)
    }
  }

  def evaluateAll(
      forecasts: Seq[(Boolean, Long, Long)],
      detections: Seq[Long]): ClassStats =
    forecasts.foldLeft(ClassStats(0, 0, 0, 0)) { case (acc, (pos, s, e)) =>
      acc + evaluate(pos, s, e, detections)
    }
}
