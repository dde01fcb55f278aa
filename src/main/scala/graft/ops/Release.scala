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

  /** Persist `df` and unpersist it automatically after the first
    * completed (or failed) execution that consumed it.
    */
  def afterFirstUse(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = df.queryExecution.analyzed
    val cached = df.persist()
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private def maybeRelease(qe: QueryExecution): Unit =
        if (qe.analyzed.exists(_.sameResult(target))) {
          cached.unpersist(false)
          spark.listenerManager.unregister(this)
        }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
    cached
  }
}
