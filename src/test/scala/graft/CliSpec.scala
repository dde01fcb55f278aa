package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** CLI end-to-end over the real sf0.001 events table: recognition →
  * learnSpst → forecasting → mle, each producing non-empty, loadable
  * output (the reference's WayebCLI command set, SURVEY.md §3.2).
  */
class CliSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("cli-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val pattern = "#(;(IsEventTypePredicate(error),IsEventTypePredicate(purchase)))"
  private lazy val eventsPath = {
    // the raw events.parquet is TIMESTAMP(NANOS); rewrite via graft.Tables
    // (micros) once so Cli's plain parquet read works
    val p = Files.createTempDirectory("cli-events").toString + "/events"
    Tables(spark, "/root/testdata/sf0.001", "events").write.parquet(p)
    p
  }

  "the CLI" should "run recognition end-to-end" in {
    val out = Files.createTempDirectory("cli").toString + "/det"
    Cli.run(spark, "recognition", Map(
      "pattern" -> pattern, "input" -> eventsPath, "out" -> out))
    spark.read.parquet(out).count() should be > 0L
  }

  it should "train, save, reload and forecast" in {
    val model = Files.createTempDirectory("cli").toString + "/m.spst"
    Cli.run(spark, "learnSpst", Map(
      "pattern" -> pattern, "input" -> eventsPath, "order" -> "2", "out" -> model))
    Files.exists(java.nio.file.Paths.get(model)) shouldBe true

    val out = Files.createTempDirectory("cli").toString + "/fc"
    Cli.run(spark, "forecasting", Map(
      "pattern" -> pattern, "model" -> model, "input" -> eventsPath,
      "out" -> out, "threshold" -> "0.4"))
    spark.read.parquet(out).count() should be > 0L
  }

  it should "estimate an MLE matrix at order 0 and 1" in {
    val out0 = Files.createTempDirectory("cli").toString + "/mle0"
    Cli.run(spark, "mle", Map("pattern" -> pattern, "input" -> eventsPath, "out" -> out0))
    val m0 = spark.read.parquet(out0)
    m0.count() should be > 0L
    // rows sum to 1 per from-state
    import org.apache.spark.sql.functions._
    m0.groupBy("from").agg(sum("p").as("s")).collect()
      .foreach(r => r.getAs[Double]("s") shouldBe 1.0 +- 1e-9)

    val out1 = Files.createTempDirectory("cli").toString + "/mle1"
    Cli.run(spark, "mle", Map(
      "pattern" -> pattern, "input" -> eventsPath, "order" -> "1", "out" -> out1))
    // the disambiguated chain has at least as many states
    spark.read.parquet(out1).select(max(col("from"))).collect()(0).getInt(0) should be >=
      m0.select(max(col("from"))).collect()(0).getInt(0)
  }
}
