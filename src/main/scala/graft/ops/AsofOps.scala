package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** As-of (backward) join — the time-series primitive Spark lacks natively
  * (pandas merge_asof / DuckDB ASOF JOIN): for every left row, attach the
  * LATEST right row of the same key with right.ts <= left.ts, optionally
  * within a tolerance.
  *
  * Implementation is the scale-correct union+window form: tag both sides,
  * union, and carry the right row forward as ONE struct with
  * last(ignoreNulls) over (key, ts, tag, tiebreakers). ONE shuffle on the
  * key, an in-partition sort, no join — a naive range join would explode
  * on (key, ts-window) pairs; this stays linear and AQE-friendly at any
  * fact size. Right rows sort before left rows at equal timestamps (<=
  * semantics); carrying a single struct keeps the attached columns from
  * one right row even when some of its values are null (per-column
  * backfill would stitch attributes of different rows together).
  */
object AsofOps {

  /** @param right       must share `by` and `ts` column names with `left`
    * @param valueCols   right columns to carry (exposed as `asof_<name>`,
    *                    plus `asof_ts` = the matched right timestamp)
    * @param tolerance   max allowed left.ts - right.ts (same unit as `ts`);
    *                    0 = unbounded
    * @param tieBreakers right columns (subset of valueCols) appended to the
    *                    window ordering so equal-timestamp right rows
    *                    resolve deterministically
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      by: String,
      ts: String,
      valueCols: Seq[String],
      tolerance: Long = 0L,
      tieBreakers: Seq[String] = Nil): DataFrame = {
    val payloadType = StructType(
      StructField("__ats", LongType) +:
        valueCols.map(c => right.schema(c).copy(name = c)))
    val l = left
      .withColumn("__tag", lit(1))
      .withColumn("__asof", lit(null).cast(payloadType))
    val r = {
      val base = right.select(
        col(by), col(ts),
        struct(col(ts).cast("long").as("__ats") +: valueCols.map(col): _*).as("__asof"))
        .withColumn("__tag", lit(0))
      // align to the left schema: missing left columns become nulls
      l.columns.foldLeft(base) { (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(l.schema(c).dataType))
      }.select(scala.collection.immutable.ArraySeq.unsafeWrapArray(l.columns.map(col)): _*)
    }

    val order: Seq[Column] =
      Seq(col(ts), col("__tag")) ++ tieBreakers.map(c => col("__asof").getField(c))
    val w = Window.partitionBy(col(by))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
    val gated =
      if (tolerance <= 0) filled
      else filled.withColumn("__asof",
        when(col(ts).cast("long") - col("__asof").getField("__ats") <= tolerance, col("__asof")))

    val projected = valueCols.foldLeft(
      gated.withColumn("asof_ts", col("__asof").getField("__ats"))) { (df, c) =>
      df.withColumn(s"asof_$c", col("__asof").getField(c))
    }
    projected.filter(col("__tag") === 1).drop("__tag", "__asof")
  }
}
