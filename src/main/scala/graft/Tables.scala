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
        // events.ts encoding varies by driver generation — normalize it
        // (see normalizeTs). nanosAsLong must be set BEFORE the read so
        // a TIMESTAMP(NANOS) table is legal for the vectorized reader.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        normalizeTs(spark, spark.read.parquet(s"$sfDir/$name.parquet"))
      } else spark.read.parquet(s"$sfDir/$name.parquet")
    raw
  }

  /** Normalize the events `ts` column to TimestampType (epoch micros)
    * across the three encodings the driver has generated:
    *   - TIMESTAMP(NANOS): illegal for Spark's vectorized reader, so it
    *     is read as LongType via `nanosAsLong`; truncate to micros
    *     (exactly what DuckDB's epoch_us does) with integer `div` — a
    *     double division would lose precision above 2^53 ns.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads it as
    *     TIMESTAMP_NTZ, on which unix_micros/window arithmetic is
    *     illegal. The driver's DuckDB oracle reads the same column
    *     naively (epoch_us = raw micros), so the stored micros must be
    *     preserved bit-for-bit regardless of the session timezone: an
    *     NTZ-to-NTZ timestampdiff against the epoch literal recovers
    *     them without consulting (or mutating) session state — a plain
    *     NTZ→TZ cast would resolve against the ambient timezone.
    *   - TIMESTAMP(MICROS, UTC) (e.g. a Spark-written ScaleGen copy):
    *     already TimestampType — pass through untouched.
    */
  def normalizeTs(spark: SparkSession, df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", timestamp_micros(
          expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")))
      case _ => df
    }
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
