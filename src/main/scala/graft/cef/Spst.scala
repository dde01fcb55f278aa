package graft.cef

import scala.collection.mutable

/** Symbolic Prediction Suffix Tree: the product of the streaming SDFA with a
  * PST over the minterm alphabet (reference fsm/SPSTInterface.scala).
  *
  * A virtual state is a (PST node label, SDFA state) pair; the runtime
  * tracks the SDFA state plus a cyclic buffer of the last `order` symbols,
  * and the waiting-time distribution of a virtual state is computed by
  * recursive path expansion: next-symbol probabilities come from the PST
  * conditioned on the label, state evolution from the SDFA
  * (SPSTInterface.scala:406-560 computeWtDistsOpt).
  */
final case class Spst(sdfa: Sdfa, pst: Pst, order: Int) {

  private type VState = (List[Int], Int)

  /** P(first hit of an SDFA final state at exactly t | current label+state),
    * with path-probability cutoff pruning (`wtCutoffThreshold` 0.001 in the
    * reference, ConfigUtils.scala).
    */
  def wtDistribution(
      label: List[Int],
      sdfaState: Int,
      horizon: Int,
      cutoff: Double = 0.001): WtDistribution = {
    val symbols = (0 until sdfa.iso.size).toList
    var frontier: List[(VState, Double)] = List(((label, sdfaState), 1.0))
    val wt = mutable.Map.empty[Int, Double]
    var t = 1
    while (t <= horizon && frontier.nonEmpty) {
      val expanded = mutable.Map.empty[VState, Double]
      var hit = 0.0
      frontier.foreach { case ((lbl, st), p) =>
        symbols.foreach { sym =>
          val pSym = pst.condProbFor(sym, lbl)
          if (pSym > 0) {
            val p2 = p * pSym
            val nextSt = sdfa.delta(st)(sym)
            if (sdfa.isFinal(nextSt)) hit += p2
            else if (p2 > cutoff) {
              val nextLbl = pst.nodeFor(sym :: lbl).label
              expanded((nextLbl, nextSt)) = expanded.getOrElse((nextLbl, nextSt), 0.0) + p2
            }
          }
        }
      }
      wt(t) = hit
      frontier = expanded.toList
      t += 1
    }
    WtDistribution(wt.toMap)
  }

  /** Forecast table for every reachable (leaf label × SDFA state) pair —
    * precomputed once per model at load time, O(1) lookup per event
    * (reference WtForecasterBuilder.scala:55-120).
    */
  def forecastTable(
      method: ForecastMethod,
      threshold: Double,
      spread: Int,
      horizon: Int,
      cutoff: Double = 0.001): Map[(List[Int], Int), ForecastInterval] = {
    val labels = pst.leaves.map(_.label).distinct
    val pairs = for {
      lbl <- labels
      st <- 0 until sdfa.nStates
    } yield (lbl, st)
    pairs.map { case (lbl, st) =>
      (lbl, st) -> wtDistribution(lbl, st, horizon, cutoff).build(method, threshold, spread)
    }.toMap
  }
}

/** One emitted forecast, anchored at the event counter where it was made
  * (reference model/forecaster/runtime/RelativeForecast).
  */
final case class ForecastOut(
    partition: String,
    counter: Long,
    eventId: Long,
    timestamp: Long,
    startCounter: Long,
    endCounter: Long,
    prob: Double,
    positive: Boolean)

/** Per-key forecasting run: a [[DetRun]] plus the symbol buffer and the
  * precomputed forecast table (reference ForecasterRun.scala:58-120 wired
  * into WayebEngine.java:432-470). Emits a forecast after every event once
  * the buffer holds a full context (SPST warm-up, Run.scala:305-460), and
  * detections whenever the SDFA hits a final state.
  */
final class SpstRun(
    cp: CompiledPattern,
    spst: Spst,
    table: Map[(List[Int], Int), ForecastInterval],
    val partition: String) extends Serializable {

  private val det = new DetRun(cp, partition)
  private val buffer = new SymbolBuffer(math.max(1, spst.order))

  def eventCounter: Long = det.eventCounter

  def step(e: CEvent): (Option[Detection], Option[ForecastOut]) = {
    if (e.isReset) { det.reset(); buffer.clear(); return (None, None) }
    val sym = cp.iso.evaluate(e)
    if (sym >= 0) buffer.push(sym)
    val d = det.step(e, sym) // symbol already evaluated for the buffer
    val f =
      if (buffer.isFull) {
        val label = spst.pst.nodeFor(buffer.pop).label
        table.get((label, det.currentState)).filter(_.isValid).map { fi =>
          ForecastOut(partition, det.eventCounter, e.id, e.timestamp,
            det.eventCounter + fi.start, det.eventCounter + fi.end, fi.prob, fi.positive)
        }
      } else None
    (d, f)
  }
}
