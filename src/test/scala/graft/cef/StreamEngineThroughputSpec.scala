package graft.cef

import graft.cef.spark.{Detect, Stream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll
import scala.util.Random

/** Streaming-path throughput, separated from scaffold cost (VERDICT r10
  * #4). The 15 driver streaming gates replay THREE forced micro-batches
  * of a few thousand rows each, so their bench seconds are ~70% fixed
  * per-batch scaffold (state-store commit + trigger planning + slice
  * file IO) — they gate correctness, not speed. This spec measures what
  * the ENGINE sustains through the real Structured Streaming path
  * (`Stream.detections` / `Stream.forecasts`) at steady state: a small
  * warm-up micro-batch populates GroupState, then ONE large micro-batch
  * (1M events) amortizes the fixed cost, and the rate is that batch's
  * rows / triggerExecution time as reported by the query's own progress
  * events. Reported next to the in-JVM single-core rates
  * (ThroughputSpec) and Wayeb's published single-core 100k–1M events/s
  * regime (BASELINE.md §6); the numbers land in SCALE.md's r11 table.
  *
  * Floors are an order of magnitude under quiet-machine rates (shared
  * box, ThroughputSpec's rationale): they catch O(n) blowups in the
  * streaming hot path (per-key sort, snapshot/restore encode), not
  * machine weather. The per-batch fixed cost is also measured directly
  * (three ~200-row batches) so the SCALE.md table can subtract scaffold
  * from gate seconds.
  */
class StreamEngineThroughputSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private val Keys = 32
  private val WarmRows = 50000
  private val MainRows = 1000000

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .appName("stream-engine-throughput")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** (event_id, event_type, ts, user_id, value) rows, ts = id (epoch
    * long — toEvents casts integral ts columns directly).
    */
  private def eventsDf(from: Int, n: Int): DataFrame = {
    val rnd = new Random(from) // deterministic per slice
    val types = Array("a", "b", "c", "d")
    val sparkS = spark
    import sparkS.implicits._
    (from until from + n).map { i =>
      (i.toLong, types(rnd.nextInt(4)), i.toLong, s"u${i % Keys}",
        rnd.nextInt(200).toDouble)
    }.toDF("event_id", "event_type", "ts", "user_id", "value")
  }

  /** Write each slice as one parquet file with strictly increasing
    * mtimes (the file source feeds oldest first, one per trigger).
    */
  private def writeSlices(slices: Seq[DataFrame]): java.nio.file.Path = {
    val srcDir = java.nio.file.Files.createTempDirectory("engine-tput-src")
    val tmp = java.nio.file.Files.createTempDirectory("engine-tput-tmp")
    import scala.jdk.CollectionConverters._
    slices.zipWithIndex.foreach { case (df, i) =>
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = srcDir.resolve(f"slice-${i + 1}%03d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 1000L))
    }
    java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
      .foreach(f => java.nio.file.Files.deleteIfExists(f))
    srcDir
  }

  /** Run the transform through a real streaming query (file source, one
    * slice per trigger, memory sink) and return the non-empty batches'
    * (rows, triggerExecution seconds) plus the sink row count.
    */
  private def runMeasured(srcDir: java.nio.file.Path)(
      transform: DataFrame => DataFrame): (Seq[(Long, Double)], Long) = {
    val schema = spark.read.parquet(srcDir.toString).schema
    val ckpt = java.nio.file.Files.createTempDirectory("engine-tput-ckpt")
    val sink = s"engine_tput_${System.nanoTime()}"
    val q = transform(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString))
      .writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map(p => (p.numInputRows,
        p.durationMs.get("triggerExecution").toDouble / 1000.0))
    val out = spark.table(sink).count()
    spark.catalog.dropTempView(sink)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq.reverse
      .foreach(f => java.nio.file.Files.deleteIfExists(f))
    (batches, out)
  }

  private def toEvents(df: DataFrame) =
    Detect.toEvents(df, idCol = "event_id", typeCol = "event_type",
      tsCol = "ts", partitionCol = "user_id", numAttrs = Seq("value"))

  /** The narrow ingest (Detect.toEventStream) — the recommended Stream
    * entry since round 13: the keyed shuffle moves value arrays, not
    * per-row attr maps (~1.5x the CEvent path at steady state, ≥1 M
    * ev/s at 4M-row batches — SCALE.md round-13 grid).
    */
  private def toES(df: DataFrame) =
    Detect.toEventStream(df, idCol = "event_id", typeCol = "event_type",
      tsCol = "ts", partitionCol = "user_id", numAttrs = Seq("value"))

  /** Best-of-attempts over fresh streaming queries (ThroughputSpec's
    * discipline: attempt 1 pays JIT + first-use class loading for the
    * whole streaming stack; the guarded quantity is what the code
    * sustains). Returns (best rate, last attempt's sink rows).
    */
  private def bestSteadyRate(src: java.nio.file.Path, attempts: Int)(
      transform: DataFrame => DataFrame): (Double, Long) = {
    var best = 0.0
    var out = 0L
    for (_ <- 1 to attempts) {
      val (batches, o) = runMeasured(src)(transform)
      batches.size shouldBe 2 // warm batch + the measured steady-state batch
      val (rows, secs) = batches.last
      rows shouldBe MainRows.toLong
      best = math.max(best, rows / secs)
      out = o
    }
    (best, out)
  }

  it should "sustain >150k events/s through the streaming detection path at steady state" in {
    val cp = Compiler.compile(
      ";(IsEventTypePredicate(a),+(IsEventTypePredicate(b),IsEventTypePredicate(c)),GTPredicate(value,100.0))")
    val src = writeSlices(Seq(eventsDf(0, WarmRows), eventsDf(WarmRows, MainRows)))
    val (rate, detections) = bestSteadyRate(src, attempts = 2) { raw =>
      Stream.detections(toES(raw), cp).toDF()
    }
    info(f"streaming detections steady state: ${rate / 1e6}%.2f M events/s " +
      f"(best of 2 × $MainRows-row batches, $detections detections, 8 cores)")
    detections should be > 0L
    rate should be > 150000.0
  }

  it should "sustain >50k events/s through the streaming forecast path at steady state" in {
    val cp = Compiler.compile("#(;(IsEventTypePredicate(a),IsEventTypePredicate(b)))")
    val rnd = new Random(1)
    val types = Array("a", "b", "c", "d")
    val train = Array.tabulate(50000) { i =>
      CEvent(i.toLong, types(rnd.nextInt(4)), i.toLong, "",
        Map("value" -> rnd.nextInt(200).toDouble), Map.empty)
    }
    val spst = adapt.InMemory.train(train.toSeq, cp, order = 2,
      pMin = 0.001, gammaMin = 0.001)
    val table = spst.forecastTable(ForecastMethod.ClassifyNextK, 0.4, 10, 20)
    val src = writeSlices(Seq(eventsDf(0, WarmRows), eventsDf(WarmRows, MainRows)))
    val (rate, forecasts) = bestSteadyRate(src, attempts = 2) { raw =>
      Stream.forecasts(toES(raw), cp, spst, table).toDF()
    }
    info(f"streaming forecasts steady state: ${rate / 1e6}%.2f M events/s " +
      f"(best of 2 × $MainRows-row batches, $forecasts forecasts, 8 cores)")
    forecasts should be > 0L
    rate should be > 50000.0
  }

  it should "sustain >60k events/s through the streaming DSRA register path at steady state" in {
    // C10: register pattern (value bound + register comparison) with a
    // count window — the hyper-state (configuration set + valuations +
    // window anchors) round-trips through GroupState per micro-batch
    val cpR = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,120.0)["x"],GTAttrPredicate(value,"x"))){window:10}{windowType:count}""")
    val src = writeSlices(Seq(eventsDf(0, WarmRows), eventsDf(WarmRows, MainRows)))
    val (rate, detections) = bestSteadyRate(src, attempts = 2) { raw =>
      Stream.detectionsDsra(toES(raw), cpR).toDF()
    }
    info(f"streaming DSRA steady state: ${rate / 1e6}%.2f M events/s " +
      f"(best of 2 × $MainRows-row batches, $detections detections, 8 cores)")
    detections should be > 0L
    rate should be > 60000.0
  }

  it should "sustain >30k events/s through the streaming match-enumeration path at steady state" in {
    // R4: full nondeterministic match enumeration — the thread pool
    // lives in GroupState; the windowed SREMO pattern bounds threads
    val cpM = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,120.0)["x"],GTAttrPredicate(value,"x"))){window:10}{windowType:count}""")
    val src = writeSlices(Seq(eventsDf(0, WarmRows), eventsDf(WarmRows, MainRows)))
    val (rate, matches) = bestSteadyRate(src, attempts = 2) { raw =>
      Stream.matches(toES(raw), cpM).toDF()
    }
    info(f"streaming match enumeration steady state: ${rate / 1e6}%.2f M events/s " +
      f"(best of 2 × $MainRows-row batches, $matches matches, 8 cores)")
    matches should be > 0L
    rate should be > 30000.0
  }

  it should "measure the per-micro-batch scaffold cost the driver gates pay" in {
    // the gates' shape: tiny batches, where triggerExecution is almost
    // entirely fixed cost. Recorded so SCALE.md can attribute the
    // streaming family's bench seconds to scaffold vs engine.
    val cp = Compiler.compile(
      ";(IsEventTypePredicate(a),+(IsEventTypePredicate(b),IsEventTypePredicate(c)),GTPredicate(value,100.0))")
    val src = writeSlices(Seq(
      eventsDf(0, 200), eventsDf(200, 200), eventsDf(400, 200)))
    val (batches, _) = runMeasured(src) { raw =>
      Stream.detections(toEvents(raw), cp).toDF()
    }
    batches.size shouldBe 3
    val perBatch = batches.map(_._2)
    info(f"scaffold per-micro-batch cost at 200 rows: " +
      f"${perBatch.map(s => f"$s%.2f").mkString(", ")} s " +
      f"(median ${perBatch.sorted.apply(1)}%.2f s)")
    // sanity only: a 200-row batch must not take engine-scale time
    perBatch.sorted.apply(1) should be < 30.0
  }
}
