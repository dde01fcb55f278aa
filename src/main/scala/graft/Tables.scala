package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * All parquet; schema fixed by the driver. Filters/projections applied
  * after these loads are pushed into the parquet scan by Catalyst.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw =
      if (name == "events") {
        // events.ts is parquet TIMESTAMP(NANOS) — illegal for Spark's
        // vectorized reader. Read nanos as LongType, truncate to micros
        // (exactly what DuckDB's epoch_us does) and restore TimestampType.
        // `div` (integer division) — a double division would lose
        // precision above 2^53 ns. Type-gated: a Spark-written copy of
        // the table (ScaleGen) is already TIMESTAMP(MICROS) and must
        // pass through untouched.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = spark.read.parquet(s"$sfDir/$name.parquet")
        df.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case _ => df
        }
      } else spark.read.parquet(s"$sfDir/$name.parquet")
    raw
  }
}

/** One registered query: a Spark DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over
  * the same tables. Column names MUST match between the two — the
  * driver's compare sorts columns by name before hashing.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
