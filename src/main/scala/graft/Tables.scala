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
    val path = s"$sfDir/$name.parquet"
    val raw =
      if (name == "events") {
        // events.ts encoding varies by driver generation — normalize it
        // (see normalizeTs). nanosAsLong must be set BEFORE the read so
        // a TIMESTAMP(NANOS) table is legal for the vectorized reader.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        normalizeTs(spark, spark.read.parquet(path))
      } else spark.read.parquet(path)
    raw
  }

  /** [[apply]] plus [[fanOutSmallScan]] — an OPT-IN for queries whose
    * dominant cost is per-row map work on the scanned table (vector
    * math, per-document fingerprint scans). A full-bench A/B of the
    * blanket form (r16) measured the fan-out exchange as a net LOSS on
    * join-heavy queries (extra stage + round-robin sort + AQE losing
    * the tiny-side broadcast estimate: q02 0.73→1.40 s, p06 2.65→3.85,
    * min-of-2 totals 178→221 s) while map-bound queries gained 2–4×
    * (p54 1.37→0.35, p27 2.03→1.37) — so the fan-out is applied per
    * query, never at the shared loader.
    */
  def wide(spark: SparkSession, sfDir: String, name: String): DataFrame =
    fanOutSmallScan(spark, apply(spark, sfDir, name), s"$sfDir/$name.parquet")

  /** Conf key for [[fanOutSmallScan]]'s per-task byte floor; 0 disables
    * the fan-out entirely.
    */
  val SmallScanBytesPerTaskKey = "spark.graft.scan.smallBytesPerTask"

  /** Floor on scan parallelism for SMALL tables (r16; guide §2.5/§6
    * "input skew — one huge unsplittable file"): the test tables are
    * single-row-group parquet files, so a scan is a ONE-task stage and
    * every map-side operator before the first exchange — tokenize,
    * n-gram arrays, hash lanes, predicate evaluation — runs on one core
    * regardless of cluster size. When the on-disk footprint is under
    * (defaultParallelism × bytesPerTask), fan the read out to
    * defaultParallelism partitions: a 1–10 MB round-robin shuffle buys
    * cores× parallelism for all downstream map work. At production
    * scale a table this small is broadcast-side anyway and big tables
    * produce ≥ cores splits on their own, so the fan-out never fires —
    * the threshold scales with the session's core count, not with a
    * constant tuned to this box. Disable with
    * `spark.graft.scan.smallBytesPerTask=0`.
    */
  private def fanOutSmallScan(
      spark: SparkSession, raw: DataFrame, path: String): DataFrame = {
    val perTask = spark.conf.getOption(SmallScanBytesPerTaskKey)
      .map { v =>
        // a malformed conf value must name the key at fault, not die in
        // a bare NumberFormatException at plan construction (r16 ADVICE)
        try v.toLong
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$SmallScanBytesPerTaskKey must be a long, got '$v'")
        }
      }.getOrElse(4L << 20)
    if (perTask <= 0) return raw
    val cores = spark.sparkContext.defaultParallelism
    val bytes = dataSize(java.nio.file.Paths.get(path))
    if (bytes < perTask * cores) raw.repartition(cores) else raw
  }

  /** On-disk DATA bytes of a local parquet table: the file's size, or
    * for a directory-backed dataset (the standard Spark write layout)
    * the sum of the regular files inside. `Files.size` on a directory
    * returns the directory inode size (~4 KB) without throwing, which
    * would misclassify an arbitrarily large multi-split table as
    * "small" and collapse its scan parallelism with a full round-robin
    * shuffle (r16 ADVICE, medium). Unreadable/non-local paths return
    * Long.MaxValue — the fan-out then leaves the scan alone.
    */
  private def dataSize(p: java.nio.file.Path): Long =
    try {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.isRegularFile(p)) java.nio.file.Files.size(p)
      else if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.walk(p).iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(f => try java.nio.file.Files.size(f) catch { case _: Exception => 0L })
          .sum
      else Long.MaxValue
    } catch { case _: Exception => Long.MaxValue }

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
