package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Storage discipline for single-consumer cached intermediates.
  *
  * A signature table that feeds several joins of ONE query wants to be
  * persisted for that query's duration and released the moment the query
  * finishes — leaving it pinned taxes every later query in the session
  * (at 100 TB a leaked corpus-sized cache is a scale-killer), while
  * unpersisting before the action would recompute the whole chain per
  * consumer. `Dataset.unpersist` has no "when the query is done" hook, so
  * this helper watches the session's execution listener bus: the first
  * completed execution whose analyzed plan contains the cached table's
  * plan as a subtree is, by construction, the consuming query — release
  * the cache and deregister. A released DataFrame executed again later
  * silently recomputes from lineage (the same contract the shared
  * near-dup pair memo pins in PlanSpec).
  */
object Release {

  /** Executions a listener survives without matching before it expires.
    * A cached DataFrame whose consumer never ran within this many later
    * queries is treated as abandoned: the cache is dropped (recompute
    * from lineage is always safe) and the listener deregisters, so a
    * long-lived server issuing many unconsumed cached DataFrames keeps a
    * bounded listener population instead of scanning every future plan.
    */
  val MaxMisses = 64

  // live listeners, observable by tests (listenerManager has no size
  // API). A listener whose session has STOPPED can never fire again —
  // its bus is dead — so keeping it "live" would leak its captured plan
  // and cache reference for the JVM's lifetime in a server that cycles
  // sessions (the same hazard Pipeline's pairCache prunes for its map
  // keys). Every registration and every count observation reaps them.
  private val live =
    java.util.concurrent.ConcurrentHashMap.newKeySet[WatchedListener]()

  def activeListeners: Int = { reapStopped(); live.size }

  private def reapStopped(): Unit =
    live.forEach(w => if (w.spark.sparkContext.isStopped) w.release())

  /** Persist `df` and unpersist it automatically after the first
    * completed (or failed) execution that consumed it, or after
    * [[MaxMisses]] unrelated executions (whichever comes first).
    */
  def afterFirstUse(df: DataFrame): DataFrame =
    watched(df, releaseOnHit = true, idleBudget = MaxMisses)

  /** Persist `df` for MULTIPLE consumers and unpersist it once
    * `idleBudget` consecutive executions pass without any of them
    * touching it (each hit resets the countdown). The shared near-dup
    * pair memo uses this: p06, p15 and p51 all consume the same chain
    * at unpredictable points of a sweep, so single-use release would
    * force whichever runs later to rebuild the dominant cost, while no
    * release would pin pair-table storage for the session. A released
    * DataFrame executed again later silently recomputes from lineage.
    */
  def afterIdle(df: DataFrame, idleBudget: Int): DataFrame =
    watched(df, releaseOnHit = false, idleBudget = idleBudget)

  private def watched(df: DataFrame, releaseOnHit: Boolean, idleBudget: Int): DataFrame = {
    reapStopped()
    val cached = df.persist()
    val listener = new WatchedListener(df.sparkSession, cached, releaseOnHit, idleBudget)
    live.add(listener)
    df.sparkSession.listenerManager.register(listener)
    cached
  }

  private final class WatchedListener(
      val spark: org.apache.spark.sql.SparkSession,
      cached: DataFrame,
      releaseOnHit: Boolean,
      idleBudget: Int) extends QueryExecutionListener {
    private val target = cached.queryExecution.analyzed
    private val misses = new java.util.concurrent.atomic.AtomicInteger(0)
    private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    def release(): Unit =
      if (done.compareAndSet(false, true)) {
        // on a stopped session both calls are dead-context cleanup —
        // failure must not keep the listener in the live set
        try cached.unpersist(false) catch { case _: Exception => () }
        try spark.listenerManager.unregister(this) catch { case _: Exception => () }
        live.remove(this)
      }
    private def maybeRelease(qe: QueryExecution): Unit =
      if (qe.analyzed.exists(_.sameResult(target))) {
        if (releaseOnHit) release() else misses.set(0)
      } else if (misses.incrementAndGet() >= idleBudget) release()
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      maybeRelease(qe)
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      maybeRelease(qe)
  }
}
