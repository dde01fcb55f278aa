package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 wraps Columns around ColumnNodes, and the Expression↔Column
  * converters live in `sql.classic` with private[sql] visibility — the
  * standard extension-point bridge for registering custom Catalyst
  * expressions from library code (same pattern OSS connector libraries
  * use).
  */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Frees the executor-storage blocks of an eager `localCheckpoint()`
    * Dataset once nothing references it anymore. `Dataset.unpersist` only
    * talks to the cache manager and leaves checkpoint RDD blocks pinned
    * until the driver GCs the RDD — for iterative algorithms that
    * checkpoint per round (near-dup grouping) that pins round-count ×
    * table-size of executor storage for the session. The checkpointed
    * Dataset's plan is a `LogicalRDD` over the materialized RDD; unpersist
    * that RDD directly.
    */
  def releaseLocalCheckpoint(df: Dataset[_]): Unit = df match {
    case d: classic.Dataset[_] =>
      d.queryExecution.logical match {
        case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    case _ => ()
  }
}
