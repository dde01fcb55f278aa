package graft.cef.spark

import graft.cef._
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Structured Streaming inference (SURVEY.md §7.1.2): the keyed stateful
  * operator that mirrors the reference's Flink engine
  * (java/.../WayebEngine.java:225-320) —
  *
  *   kafka/socket/memory source → parse → groupByKey(partitionAttr)
  *     → flatMapGroupsWithState[RunState, Output]
  *
  * GroupState persists exactly what the reference snapshots into Flink
  * ValueState (WayebEngine.java:276-287): automaton state, event counter,
  * running-match bounds, and (for forecasting runs) the symbol buffer.
  *
  * Events within a micro-batch are sorted by (timestamp, id) per key before
  * stepping the automaton — Spark gives no intra-batch order guarantee, and
  * automaton determinism requires event-time totality within a key
  * (SURVEY.md §7.4). Cross-batch reordering is NOT absorbed: like the
  * reference (which trusts Flink's keyed in-order delivery after the 60 s
  * watermark), callers should feed watermarked, de-duplicated input.
  */
object Stream {

  implicit private val detEnc: Encoder[Detection] = Encoders.product[Detection]
  implicit private val matchEnc: Encoder[MatchOut] = Encoders.product[MatchOut]
  implicit private val stringEnc: Encoder[String] = Encoders.STRING
  implicit private val detStateEnc: Encoder[DetRunState] = Encoders.product[DetRunState]
  implicit private val matchStateEnc: Encoder[MatchRunState] = Encoders.product[MatchRunState]

  /** Deterministic detection-point stream (R1 over the streaming SDFA).
    *
    * `stateTtl` (milliseconds, 0 = keep forever) expires idle keys — the
    * Spark analogue of the reference's run-pool expiration GC
    * (`expirationDeadline`, ERFEngine.scala:95-101, RunPool.scala:186;
    * SURVEY.md §2.3 K5): a key that receives no events for the TTL loses
    * its run state and restarts from the automaton's start state.
    */
  def detections(
      events: Dataset[CEvent],
      cp: CompiledPattern,
      stateTtl: Long = 0L): Dataset[Detection] = {
    val timeoutConf =
      if (stateTtl > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events.groupByKey(_.partition)
      .flatMapGroupsWithState[DetRunState, Detection](
        OutputMode.Append, timeoutConf) {
        (key: String, rows: Iterator[CEvent], state: GroupState[DetRunState]) =>
          if (state.hasTimedOut) {
            state.remove() // stale run reclaimed
            Iterator.empty
          } else {
            val run = new DetRun(cp, key)
            state.getOption.foreach(run.restore)
            val out = rows.toSeq.sortBy(e => (e.timestamp, e.id)).flatMap(run.step)
            state.update(run.snapshot)
            if (stateTtl > 0) state.setTimeoutDuration(stateTtl)
            out.iterator
          }
      }
  }

  /** C10 deterministic register-pattern stream: the DSRA hyper-state
    * (configuration set + valuations + window anchors) lives in GroupState, mirroring the
    * reference's DSRAStreaming Configuration payloads.
    */
  def detectionsDsra(events: Dataset[CEvent], cp: CompiledPattern): Dataset[Detection] = {
    implicit val dsraStateEnc: Encoder[DsraRunState] = Encoders.product[DsraRunState]
    events.groupByKey(_.partition)
      .flatMapGroupsWithState[DsraRunState, Detection](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[CEvent], state: GroupState[DsraRunState]) =>
          val run = new DsraRun(cp, key)
          state.getOption.foreach(run.restore)
          val out = rows.toSeq.sortBy(e => (e.timestamp, e.id)).flatMap(run.step)
          state.update(run.snapshot)
          out.iterator
      }
  }

  /** Full match-enumeration stream (R4): thread pool lives in GroupState,
    * like the reference's run pool registered per (fsmId, partition value)
    * (ERFEngine.scala:230-266, RunPool.scala:33-211).
    */
  def matches(
      events: Dataset[CEvent],
      cp: CompiledPattern,
      maxThreads: Int = MatchRun.DefaultMaxThreads): Dataset[MatchOut] =
    events.groupByKey(_.partition)
      .flatMapGroupsWithState[MatchRunState, MatchOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[CEvent], state: GroupState[MatchRunState]) =>
          val run = new MatchRun(cp, key, maxThreads)
          state.getOption.foreach(run.restore)
          val out = rows.toSeq.sortBy(e => (e.timestamp, e.id)).flatMap(run.step)
          state.update(run.snapshot)
          out.iterator
      }

  /** F5 through the streaming engine: the forecasting runtime
    * ([[RestorableSpstRun]] — DetRun 4-tuple + SPST symbol buffer) with
    * its state round-tripping through GroupState at every micro-batch
    * boundary, the same keyed-stateful shape as [[detections]]
    * (reference: the Flink engine emits forecasts from the identical
    * per-key snapshot, WayebEngine.java:276-320). The model and its
    * precomputed forecast table ride the task closure — they are
    * model-sized immutable values, exactly like the compiled pattern.
    */
  def forecasts(
      events: Dataset[CEvent],
      cp: CompiledPattern,
      spst: Spst,
      table: Map[(List[Int], Int), ForecastInterval]): Dataset[ForecastOut] = {
    implicit val fEnc: Encoder[ForecastOut] = Encoders.product[ForecastOut]
    implicit val stEnc: Encoder[SpstStreamState] = Encoders.product[SpstStreamState]
    events.groupByKey(_.partition)
      .flatMapGroupsWithState[SpstStreamState, ForecastOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[CEvent], state: GroupState[SpstStreamState]) =>
          val run = new RestorableSpstRun(cp, spst, table, key)
          state.getOption.foreach(s => run.restore(s.det, s.buffer))
          val out = rows.toSeq.sortBy(e => (e.timestamp, e.id)).flatMap(e => run.step(e)._2)
          state.update(SpstStreamState(run.detSnapshot, run.bufferSnapshot))
          out.iterator
      }
  }

  /** The same deterministic runtime on Spark 4's transformWithState
    * operator — the successor to flatMapGroupsWithState (typed state
    * variables, native TTL, RocksDB-only backend). Functionally identical
    * to [[detections]]; both are kept because transformWithState requires
    * the RocksDB state store while flatMapGroupsWithState runs anywhere.
    */
  /** F5 for REGISTER patterns (C10×F2): the DSRA hyper-state
    * (configuration set + valuations + anchors) plus the SPSTm symbol
    * buffer round-trip GroupState at every micro-batch boundary. Each
    * event is symbolized from the runtime's observable trace exactly
    * like [[Detect.dsraTrace]] (detection / fresh anchor / other, and
    * the anchor-age abstract state, grid-bucketed for TIME windows),
    * and the (PST label, abstract state) pair indexes the precomputed
    * SPSTm forecast table — the register-pattern face of [[forecasts]].
    */
  def forecastsSpstm(
      events: Dataset[CEvent],
      cp: CompiledPattern,
      m: SpstM,
      table: Map[(List[Int], Int), ForecastInterval],
      grid: Long = 0L): Dataset[ForecastOut] = {
    implicit val fEnc: Encoder[ForecastOut] = Encoders.product[ForecastOut]
    implicit val stEnc: Encoder[SpstmStreamState] = Encoders.product[SpstmStreamState]
    val timeWindowed = cp.windowKind == WindowKind.Time
    if (timeWindowed) require(grid > 0L && cp.window % grid == 0L,
      s"time-windowed symbolization needs a grid tiling the window, got $grid")
    else require(grid == 0L, "grid applies to time-windowed patterns")
    val cells: Int = (if (timeWindowed) cp.window / grid else cp.window).toInt
    events.groupByKey(_.partition)
      .flatMapGroupsWithState[SpstmStreamState, ForecastOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[CEvent], state: GroupState[SpstmStreamState]) =>
          val run = new DsraRun(cp, key)
          val buffer = new SymbolBuffer(math.max(1, m.order))
          state.getOption.foreach { s => run.restore(s.dsra); buffer.restore(s.buffer) }
          val out = rows.toSeq.sortBy(e => (e.timestamp, e.id)).flatMap { e =>
            if (e.isReset) { run.step(e); buffer.clear(); None }
            else {
              val det = run.step(e)
              val counter = run.eventCounter
              val anchor = run.newestTakenAnchor
              val sym =
                if (det.isDefined) SpstM.SymD
                else if (run.tookAnchorThisStep) SpstM.SymA
                else SpstM.SymO
              val st =
                if (anchor < 0) cells
                else if (timeWindowed) math.min((e.timestamp - anchor) / grid, cells.toLong).toInt
                else math.min(counter - anchor, cells.toLong).toInt
              buffer.push(sym)
              if (buffer.isFull) {
                val label = m.pst.nodeFor(buffer.pop).label
                table.get((label, st)).filter(_.isValid).map { fi =>
                  ForecastOut(key, counter, e.id, e.timestamp,
                    counter + fi.start, counter + fi.end, fi.prob, fi.positive)
                }
              } else None
            }
          }
          state.update(SpstmStreamState(run.snapshot, buffer.snapshot))
          out.iterator
      }
  }

  def detectionsTws(
      events: Dataset[CEvent],
      cp: CompiledPattern,
      stateTtl: Long = 0L): Dataset[Detection] = {
    // Spark 4 rejects TTLConfig outside ProcessingTime mode
    // (StatefulProcessorHandleImpl.validateTTLConfig)
    val timeMode = if (stateTtl > 0) TimeMode.ProcessingTime() else TimeMode.None()
    events.groupByKey(_.partition)
      .transformWithState(
        new DetProcessor(cp, stateTtl), timeMode, OutputMode.Append())
  }
}

/** GroupState payload of [[Stream.forecasts]]: the forecasting runtime's
  * full snapshot — deterministic automaton state + the most-recent-first
  * SPST symbol buffer.
  */
final case class SpstStreamState(det: DetRunState, buffer: Seq[Int])

/** GroupState payload of [[Stream.forecastsSpstm]]: the DSRA hyper-state
  * snapshot + the most-recent-first SPSTm symbol buffer.
  */
final case class SpstmStreamState(dsra: DsraRunState, buffer: Seq[Int])

/** StatefulProcessor wrapping [[DetRun]]: the run snapshot lives in a typed
  * ValueState with optional native TTL (K5 run-pool expiry).
  */
final class DetProcessor(cp: CompiledPattern, stateTtl: Long)
    extends StatefulProcessor[String, CEvent, Detection] {

  @transient private var state: org.apache.spark.sql.streaming.ValueState[DetRunState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val ttl = if (stateTtl > 0) TTLConfig(java.time.Duration.ofMillis(stateTtl)) else TTLConfig.NONE
    state = getHandle.getValueState[DetRunState](
      "detRun", Encoders.product[DetRunState], ttl)
  }

  override def handleInputRows(
      key: String,
      rows: Iterator[CEvent],
      timerValues: TimerValues): Iterator[Detection] = {
    val run = new DetRun(cp, key)
    Option(state.get()).foreach(run.restore)
    val out = rows.toSeq.sortBy(e => (e.timestamp, e.id)).flatMap(run.step)
    state.update(run.snapshot)
    out.iterator
  }
}
