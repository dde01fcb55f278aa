package graft.cef.spark

import graft.cef._
import graft.cef.adapt._
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import java.util.concurrent.atomic.AtomicReference

/** The full live-inference topology (SURVEY.md §3.1, reference
  * InferenceJob.java:57-302): ingest → key by partition attribute →
  * per-key forecasting engine with pause/play + synchronized model swap →
  * tagged outputs (detections | forecasts | reports) split by filter —
  * Spark's substitute for Flink side outputs (SURVEY.md §7.1.2).
  *
  * Control plane without broadcast state (§7.1.3): sync/model-report
  * messages are applied on the DRIVER between micro-batches via a shared
  * [[ControlHandle]] (updated by a `foreachBatch` over the control stream,
  * or directly in tests). The swap stays lossless because it is still
  * gated per key on EVENT time inside the engine state.
  */
object Inference {

  /** One tagged output row (kind: detection | forecast | report). */
  final case class Out(
      kind: String,
      partition: String,
      counter: Long,
      eventId: Long,
      timestamp: Long,
      startCounter: Long,
      endCounter: Long,
      prob: Double,
      positive: Boolean,
      payload: String)

  /** Driver-side control state shared with executors via task-closure
    * capture at micro-batch planning time: Spark serializes the referenced
    * value into each batch's tasks, so updates between batches reach the
    * next batch — the per-microbatch refresh pattern.
    *
    * Commands are COMPACTED into the target state they encode (paused flag
    * + latest model id): pause/play are idempotent state targets, so
    * replaying history per key per batch is equivalent to reading the
    * consolidated summary — and the summary stays O(1) over any uptime
    * instead of growing with every optimization round.
    */
  final class ControlHandle extends Serializable {
    /** paused = None until the first command arrives: a fresh handle after
      * a driver restart must NOT override the checkpointed per-key paused
      * state (a paused engine stays paused until an explicit play). */
    final case class Summary(paused: Option[Boolean], latestModelId: Int)
    private val state = new AtomicReference[Summary](Summary(paused = None, latestModelId = -1))
    def push(cmd: SyncCommand): Unit = state.updateAndGet { s =>
      cmd.cmdType match {
        case "pause" => s.copy(paused = Some(true))
        case "play"  => Summary(paused = Some(false),
          if (cmd.modelId >= 0) cmd.modelId else s.latestModelId)
        case _       => s
      }
    }
    /** Register a newly trained model without touching the paused flag —
      * the model_reports half of the control plane; a later play command
      * (or the running engine, if not paused) picks it up. Monotonic:
      * factory model ids increment, so a stale report collected late can
      * never roll the latest id backwards (an explicit play with a model
      * id — a deliberate rollback — still wins). */
    def pushModel(modelId: Int): Unit =
      state.updateAndGet(s => s.copy(latestModelId = math.max(s.latestModelId, modelId)))
    def current: Summary = state.get()
  }

  /** Engine state carried in GroupState across micro-batches: the run
    * snapshot plus the reporting state (pending unresolved forecasts,
    * cumulative + last-reported confusion counts, next report time) —
    * exactly the reference's keyed state set (WayebEngine.java:103-128).
    */
  final case class EngineSnapshot(
      det: DetRunState,
      buffer: Seq[Int],
      paused: Boolean,
      currentModelId: Int,
      latestModelId: Int,
      pendingSwapAt: Long,
      pendingForecasts: Seq[PendingForecast] = Nil,
      cum: Seq[Long] = Seq(0L, 0L, 0L, 0L),
      prev: Seq[Long] = Seq(0L, 0L, 0L, 0L),
      nextReportTime: Long = -1L)

  final case class PendingForecast(positive: Boolean, start: Long, end: Long)

  implicit private val outEnc: Encoder[Out] = Encoders.product[Out]
  implicit private val stringEnc: Encoder[String] = Encoders.STRING
  implicit private val snapEnc: Encoder[EngineSnapshot] = Encoders.product[EngineSnapshot]

  /** Build the streaming inference Dataset. `controls` is read at planning
    * time of each micro-batch (driver), applied before the batch's events.
    *
    * @param loadModel modelId → (spst, forecast table); must be
    *                  deterministic and serializable (executors call it)
    */
  def engine(
      events: Dataset[CEvent],
      cp: CompiledPattern,
      loadModel: Int => (Spst, Map[(List[Int], Int), ForecastInterval]),
      controls: ControlHandle,
      initialModelId: Int = 0,
      swapDelay: Long = 0L,
      reportingDistance: Long = 3600L): Dataset[Out] =
    engineImpl(Stream.narrowByKey(events), NarrowEvent.rebuild _, cp, loadModel,
      controls, initialModelId, swapDelay, reportingDistance)

  /** [[EventStream]] (narrow-ingest) face of [[engine]]. */
  def engine(
      events: EventStream,
      cp: CompiledPattern,
      loadModel: Int => (Spst, Map[(List[Int], Int), ForecastInterval]),
      controls: ControlHandle,
      initialModelId: Int,
      swapDelay: Long,
      reportingDistance: Long): Dataset[Out] = {
    implicit val nEnc: Encoder[NEvent] = Encoders.product[NEvent]
    engineImpl(events.ds.groupByKey(_.partition), events.rebuild _, cp, loadModel,
      controls, initialModelId, swapDelay, reportingDistance)
  }

  private def engineImpl[E](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[String, E],
      rebuild: E => CEvent,
      cp: CompiledPattern,
      loadModel: Int => (Spst, Map[(List[Int], Int), ForecastInterval]),
      controls: ControlHandle,
      initialModelId: Int,
      swapDelay: Long,
      reportingDistance: Long): Dataset[Out] = {

    // narrow shuffle (Stream.narrowByKey's rationale): attr maps ride as
    // array columns; CEvent rebuilt once per row post-shuffle
    grouped
      .flatMapGroupsWithState[EngineSnapshot, Out](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, nrows: Iterator[E], state: GroupState[EngineSnapshot]) =>
          val rows: Iterator[CEvent] = nrows.map(rebuild)
          // restore or create the keyed engine
          val snap = state.getOption
          var paused = snap.map(_.paused).getOrElse(false)
          var currentId = snap.map(_.currentModelId).getOrElse(initialModelId)
          var latestId = snap.map(_.latestModelId).getOrElse(initialModelId)
          var pendingAt = snap.map(_.pendingSwapAt).getOrElse(-1L)

          // apply the consolidated control state decided since the last batch;
          // an opinion-less handle (fresh after restart) leaves the
          // checkpointed paused state untouched
          val ctl = controls.current
          ctl.paused.foreach(paused = _)
          if (ctl.latestModelId >= 0) latestId = ctl.latestModelId

          var (spst, table) = loadModel(currentId)
          val engineRun = new RestorableSpstRun(cp, spst, table, key)
          snap.foreach(s => engineRun.restore(s.det, s.buffer))

          // A1 reporting state: pending forecasts resolve online against
          // detections (tp/fn) or expiry (fp/tn); cumulative + delta counts
          // emitted every reportingDistance event-time units. Min-end heap:
          // expiry pops exactly the expired entries (amortized O(log n))
          // instead of scanning every pending on every event — bounded work
          // under forecast storms (detections still drain the heap, but
          // they are rare relative to events).
          val pending = scala.collection.mutable.PriorityQueue.empty[PendingForecast](
            Ordering.by((p: PendingForecast) => -p.end))
          snap.foreach(s => pending ++= s.pendingForecasts)
          var cum = snap.map(s => ClassStats(s.cum(0), s.cum(1), s.cum(2), s.cum(3)))
            .getOrElse(ClassStats(0, 0, 0, 0))
          var prev = snap.map(s => ClassStats(s.prev(0), s.prev(1), s.prev(2), s.prev(3)))
            .getOrElse(ClassStats(0, 0, 0, 0))
          var nextReportTime = snap.map(_.nextReportTime).getOrElse(-1L)

          val out = scala.collection.mutable.ListBuffer.empty[Out]
          rows.toSeq.sortBy(e => (e.timestamp, e.id)).foreach { e =>
            if (!paused) {
              if (latestId != currentId) {
                if (pendingAt == -1L) pendingAt = e.timestamp + swapDelay
                if (e.timestamp >= pendingAt) {
                  val loaded = loadModel(latestId)
                  spst = loaded._1; table = loaded._2
                  engineRun.swapModel(spst, table)
                  currentId = latestId
                  pendingAt = -1L
                  // model swap clears stats history (WayebEngine.java:300-315)
                  cum = ClassStats(0, 0, 0, 0); prev = ClassStats(0, 0, 0, 0)
                }
              }
              val (d, f) = engineRun.step(e)
              d.foreach(x => out += Out("detection", key, x.counter, x.eventId,
                x.timestamp, 0, 0, 1.0, positive = true, ""))
              f.foreach { x =>
                out += Out("forecast", key, x.counter, x.eventId,
                  x.timestamp, x.startCounter, x.endCounter, x.prob, x.positive, "")
                pending += PendingForecast(x.positive, x.startCounter, x.endCounter)
              }
              // resolve pending forecasts
              d.foreach { det =>
                val kept = pending.dequeueAll.filter { p =>
                  if (p.start <= det.counter && det.counter <= p.end) {
                    cum += (if (p.positive) ClassStats(1, 0, 0, 0) else ClassStats(0, 0, 0, 1))
                    false
                  } else true
                }
                pending ++= kept
              }
              val counter = engineRun.eventCounter
              while (pending.nonEmpty && pending.head.end < counter) {
                val p = pending.dequeue()
                cum += (if (p.positive) ClassStats(0, 0, 1, 0) else ClassStats(0, 1, 0, 0))
              }
              // periodic report (event-time schedule, WayebEngine.java:370-430)
              if (nextReportTime == -1L) nextReportTime = e.timestamp + reportingDistance
              else if (e.timestamp >= nextReportTime) {
                val batch = ClassStats(cum.tp - prev.tp, cum.tn - prev.tn,
                  cum.fp - prev.fp, cum.fn - prev.fn)
                val report = adapt.Report(e.timestamp, key,
                  adapt.MetricGroup.of(cum), adapt.MetricGroup.ofBatch(batch))
                out += Out("report", key, counter, e.id, e.timestamp,
                  batch.tp, batch.fp, report.batch.mcc, positive = batch.tp + batch.fp + batch.fn > 0,
                  payload = reportJson(report))
                prev = cum
                nextReportTime = e.timestamp + reportingDistance
              }
            }
          }
          state.update(EngineSnapshot(engineRun.detSnapshot, engineRun.bufferSnapshot,
            paused, currentId, latestId, pendingAt,
            pending.toSeq, Seq(cum.tp, cum.tn, cum.fp, cum.fn),
            Seq(prev.tp, prev.tn, prev.fp, prev.fn), nextReportTime))
          out.iterator
      }
  }

  private def reportJson(r: adapt.Report): String = adapt.Json.render(
    "ts" -> r.timestamp, "key" -> r.key,
    "runtime" -> Map("tp" -> r.runtime.tp, "tn" -> r.runtime.tn, "fp" -> r.runtime.fp,
      "fn" -> r.runtime.fn, "mcc" -> r.runtime.mcc),
    "batch" -> Map("tp" -> r.batch.tp, "tn" -> r.batch.tn, "fp" -> r.batch.fp,
      "fn" -> r.batch.fn, "mcc" -> r.batch.mcc))

  /** Split the tagged union into the reference's three sinks
    * (InferenceJob.java:232-291 side outputs). */
  def split(out: Dataset[Out]): (Dataset[Out], Dataset[Out], Dataset[Out]) = (
    out.filter(col("kind") === "detection"),
    out.filter(col("kind") === "forecast"),
    out.filter(col("kind") === "report"))
}

/** SpstRun variant whose internal state (DetRun 4-tuple + symbol buffer)
  * can be snapshotted/restored and whose model can be swapped in place —
  * what GroupState needs (reference snapshot: WayebEngine.java:276-287).
  */
final class RestorableSpstRun(
    cp: CompiledPattern,
    private var spst: Spst,
    private var table: Map[(List[Int], Int), ForecastInterval],
    val partition: String) extends Serializable {

  private val det = new DetRun(cp, partition)
  private var buffer = new SymbolBuffer(math.max(1, spst.order))

  def detSnapshot: DetRunState = det.snapshot
  def bufferSnapshot: Seq[Int] = buffer.snapshot
  def eventCounter: Long = det.eventCounter
  def restore(d: DetRunState, buf: Seq[Int]): Unit = { det.restore(d); buffer.restore(buf) }

  /** Swap the model; the symbol buffer survives (SPST warm-up across swaps,
    * reference Run.scala:305-460 + SURVEY.md §7.4). The snapshot is
    * most-recent-first; SymbolBuffer.restore keeps the newest `size`
    * symbols on overflow, so it is passed unchanged.
    */
  def swapModel(newSpst: Spst, newTable: Map[(List[Int], Int), ForecastInterval]): Unit = {
    val keep = buffer.snapshot
    spst = newSpst
    table = newTable
    buffer = new SymbolBuffer(math.max(1, newSpst.order))
    buffer.restore(keep)
  }

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
