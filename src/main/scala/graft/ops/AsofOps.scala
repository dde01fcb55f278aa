package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — the time-series primitive Spark lacks natively
  * (pandas merge_asof / DuckDB ASOF JOIN): for every left row, attach the
  * LATEST right row of the same key with right.ts <= left.ts, optionally
  * within a tolerance.
  *
  * Implementation is the scale-correct union+window form: tag both sides,
  * union, and carry the right columns forward with last(ignoreNulls) over
  * (key, ts, tag). ONE shuffle on the key, an in-partition sort, no join —
  * a naive range join would explode on (key, ts-window) pairs; this stays
  * linear and AQE-friendly at any fact size. Right rows sort before left
  * rows at equal timestamps, giving the standard <= semantics.
  */
object AsofOps {

  /** @param right     must share `by` and `ts` column names with `left`
    * @param valueCols right columns to carry (renamed `asof_<name>`)
    * @param tolerance max allowed left.ts - right.ts (same unit as `ts`);
    *                  0 = unbounded
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      by: String,
      ts: String,
      valueCols: Seq[String],
      tolerance: Long = 0L): DataFrame = {
    val carried = valueCols.map(c => s"asof_$c")
    val l = left
      .withColumn("__tag", lit(1))
      .withColumn("__rts", lit(null).cast("long"))
      .withColumns(carried.map(c => c -> lit(null).cast(
        right.schema(valueCols(carried.indexOf(c))).dataType)).toMap)
    val r0 = right.select(
      (col(by) +: col(ts).as(ts) +: valueCols.map(c => col(c).as(s"asof_$c"))): _*)
    val r = l.columns.foldLeft(r0) { (df, c) =>
      if (df.columns.contains(c)) df
      else c match {
        case "__tag" => df.withColumn("__tag", lit(0))
        case "__rts" => df.withColumn("__rts", col(ts).cast("long"))
        case other   => df.withColumn(other, lit(null).cast(l.schema(other).dataType))
      }
    }.select(l.columns.map(col): _*)

    val w = Window.partitionBy(col(by))
      .orderBy(col(ts), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = (("__rts" +: carried)).foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val matched =
      if (tolerance <= 0) filled
      else {
        // outside tolerance: null the carried columns
        val ok = col("__rts").isNotNull && (col(ts).cast("long") - col("__rts") <= tolerance)
        carried.foldLeft(filled)((df, c) =>
          df.withColumn(c, when(ok, col(c))))
          .withColumn("__rts", when(ok, col("__rts")))
      }
    matched.filter(col("__tag") === 1).drop("__tag")
      .withColumnRenamed("__rts", "asof_ts")
  }
}
