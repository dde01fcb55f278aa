package graft.cef.adapt

import graft.cef._

/** O4: engine pause/play + synchronized lossless model swap
  * (reference WayebEngine.java:225-320, 473-490):
  *
  *   - broadcast `pause` → keyed engines skip events (no detections, no
  *     forecasts, no state mutation);
  *   - `play(model_id)` → unpause and record LATEST; each key schedules its
  *     swap at syncTime = eventTime + swapDelay and swaps when an event's
  *     timestamp passes it, clearing the stats history.
  *
  * Spark has no broadcast state; control messages are applied between
  * micro-batches on the driver (a `foreachBatch` reading the sync topic
  * updates the shared handle), which preserves the reference's semantics
  * because the swap itself remains gated per key on EVENT time
  * (SURVEY.md §7.1.3).
  */
final class SyncedEngine(
    cp: CompiledPattern,
    loadModel: Int => (Spst, Map[(List[Int], Int), ForecastInterval]),
    key: String,
    initialModelId: Int,
    swapDelay: Long = 0L,
    reportingDistance: Long = 3600L) extends Serializable {

  private var paused = false
  private var latestModelId = initialModelId
  private var currentModelId = initialModelId
  private var pendingSwapAt = -1L

  private var run: SpstRun = mkRun(initialModelId)
  val reports = new ReportTracker(reportingDistance, key)

  /** Online forecast evaluation: forecasts stay pending until a detection
    * lands inside their interval (tp/fn) or the counter passes their end
    * (fp/tn) — streaming form of the reference's collector replay
    * (ClassificationForecastCollector.scala:79-150).
    */
  private val pending = scala.collection.mutable.Queue.empty[(Boolean, Long, Long)]

  private def resolveForecasts(counter: Long, detection: Option[Long]): Unit = {
    detection.foreach { d =>
      pending.dequeueAll { case (pos, s, e) => s <= d && d <= e }
        .foreach { case (pos, _, _) =>
          reports.add(if (pos) ClassStats(1, 0, 0, 0) else ClassStats(0, 0, 0, 1))
        }
    }
    pending.dequeueAll { case (_, _, e) => e < counter }
      .foreach { case (pos, _, _) =>
        reports.add(if (pos) ClassStats(0, 0, 1, 0) else ClassStats(0, 1, 0, 0))
      }
  }

  private def mkRun(modelId: Int): SpstRun = {
    val (spst, table) = loadModel(modelId)
    new SpstRun(cp, spst, table, key)
  }

  def onSync(cmd: SyncCommand): Unit = cmd.cmdType match {
    case "pause" => paused = true
    case "play"  =>
      paused = false
      if (cmd.modelId >= 0) latestModelId = cmd.modelId
    case _ =>
  }

  def isPaused: Boolean = paused
  def modelId: Int = currentModelId

  def step(e: CEvent): (Option[Detection], Option[ForecastOut], Option[Report]) = {
    if (paused) return (None, None, None) // skip while paused (WayebEngine.java:240-246)
    if (latestModelId != currentModelId) {
      if (pendingSwapAt == -1L) pendingSwapAt = e.timestamp + swapDelay
      if (e.timestamp >= pendingSwapAt) {
        run = mkRun(latestModelId) // swap; buffer warm-up restarts
        currentModelId = latestModelId
        pendingSwapAt = -1L
        reports.resetHistory() // WayebEngine.java:300-315
      }
    }
    val (det, fc) = run.step(e)
    fc.foreach(f => pending += ((f.positive, f.startCounter, f.endCounter)))
    resolveForecasts(run.eventCounter, det.map(_.counter))
    val report = reports.maybeReport(e.timestamp)
    (det, fc, report)
  }
}
