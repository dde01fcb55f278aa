package graft

import graft.cef.spark.Detect
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Pins Tables.normalizeTs across the three parquet encodings the driver
  * has generated for events.ts (TESTDATA.md; the round-8 regen switched
  * TIMESTAMP(NANOS) → TIMESTAMP(MICROS, isAdjustedToUTC=false), which
  * Spark reads as TIMESTAMP_NTZ and which broke every unix_micros
  * consumer). The invariant: whatever the physical encoding, the
  * normalized `ts` is TimestampType and unix_micros(ts) equals the
  * stored micros the DuckDB oracle reads naively via epoch_us.
  */
class TsEncodingSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("ts-encoding-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // 2026-03-01 07:30:15.123456 UTC and a pre-epoch instant, as micros
  private val MicrosA = 1772350215123456L
  private val MicrosB = -12345678L

  private def writeRead(df: DataFrame): DataFrame = {
    val dir = Files.createTempDirectory("ts-enc").resolve("t.parquet")
    df.write.parquet(dir.toString)
    spark.read.parquet(dir.toString)
  }

  private def micros(df: DataFrame): Seq[Long] = {
    val out = Tables.normalizeTs(spark, df)
    out.schema("ts").dataType shouldBe TimestampType
    out.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
  }

  "normalizeTs" should "truncate a nanos-as-long column to micros with integer div" in {
    import spark.implicits._
    // nanos with sub-micro residue that must TRUNCATE, not round
    val df = Seq(MicrosA * 1000L + 999L, MicrosB * 1000L).toDF("ts")
    df.schema("ts").dataType shouldBe LongType
    micros(df) shouldBe Seq(MicrosB, MicrosA)
  }

  it should "reinterpret a TIMESTAMP_NTZ column in UTC preserving the stored micros" in {
    val ntz = writeRead(
      spark.range(1).select(
        timestamp_micros(lit(MicrosA)).cast(TimestampNTZType).as("ts"))
        .union(spark.range(1).select(
          timestamp_micros(lit(MicrosB)).cast(TimestampNTZType).as("ts"))))
    ntz.schema("ts").dataType shouldBe TimestampNTZType
    micros(ntz) shouldBe Seq(MicrosB, MicrosA)
  }

  it should "pass a plain TIMESTAMP(MICROS) column through untouched" in {
    val tz = writeRead(spark.range(1).select(
      timestamp_micros(lit(MicrosA)).as("ts")))
    tz.schema("ts").dataType shouldBe TimestampType
    micros(tz) shouldBe Seq(MicrosA)
  }

  it should "normalize under a non-UTC session without mutating session state" in {
    // fixture written under UTC (driver files store naive-UTC micros);
    // the READING session is skewed — normalizeTs must recover the stored
    // micros via tz-independent arithmetic, and must NOT silently override
    // a caller-set session timezone (r9 advice: reading a table should
    // never have session-wide side effects)
    val ntz = writeRead(spark.range(1).select(
      timestamp_micros(lit(MicrosA)).cast(TimestampNTZType).as("ts")))
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      micros(ntz) shouldBe Seq(MicrosA)
      spark.conf.get("spark.sql.session.timeZone") shouldBe "America/New_York"
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  "Detect.toEvents" should "accept timestamp, timestamp_ntz and integral ts columns identically" in {
    import spark.implicits._
    def base(tsCol: org.apache.spark.sql.Column): DataFrame =
      Seq((1L, "a", "k")).toDF("event_id", "event_type", "user_id")
        .withColumn("ts", tsCol)
    val asTz  = base(timestamp_micros(lit(MicrosA)))
    val asNtz = base(timestamp_micros(lit(MicrosA)).cast(TimestampNTZType))
    val asLong = base(lit(MicrosA))
    for (df <- Seq(asTz, asNtz, asLong)) {
      val ev = Detect.toEvents(df, "event_id", "event_type", "ts", "user_id").collect()
      ev.length shouldBe 1
      ev.head.timestamp shouldBe MicrosA
    }
  }

  it should "decode an NTZ ts column identically under a skewed session timezone" in {
    import spark.implicits._
    // fixture built tz-independently (a TZ→NTZ cast would itself resolve
    // against the skewed session at execution time)
    val df = Seq((1L, "a", "k")).toDF("event_id", "event_type", "user_id")
      .withColumn("ts",
        expr(s"timestampadd(MICROSECOND, ${MicrosA}L, TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      val ev = Detect.toEvents(df, "event_id", "event_type", "ts", "user_id").collect()
      ev.head.timestamp shouldBe MicrosA
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
