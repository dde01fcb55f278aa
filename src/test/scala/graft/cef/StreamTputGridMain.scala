package graft.cef

import graft.cef.spark.{Detect, Stream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.util.Random

/** Structured-streaming throughput grid (VERDICT r12 item 2): where do
  * the microseconds go between the ~14 M ev/s in-JVM engine loop
  * (ThroughputSpec) and the ~0.35 M ev/s steady state the real SS path
  * sustains (StreamEngineThroughputSpec)? Measures, per config, the
  * steady-state rate of ONE large micro-batch after a warm-up batch:
  *
  *   stage ladder (attribution): scan-only → +CEvent encode →
  *     +shuffle+state commit (no-op engine) → full detections
  *   store grid: HDFS-backed vs RocksDB vs RocksDB+changelog
  *   sizing grid: shuffle partitions {8,32} × batch rows {1M,4M}
  *
  * Results land in SCALE.md's round-13 table. Usage:
  *   sbt "Test/runMain graft.cef.StreamTputGridMain local[8] 1000000"
  */
object StreamTputGridMain {
  private val Keys = 32
  private val WarmRows = 50000

  def main(args: Array[String]): Unit = {
    val master = args.headOption.getOrElse("local[8]")
    val mainRows = if (args.length > 1) args(1).toInt else 1000000
    val spark = SparkSession.builder().master(master)
      .appName("stream-tput-grid")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cp = Compiler.compile(
      ";(IsEventTypePredicate(a),+(IsEventTypePredicate(b),IsEventTypePredicate(c)),GTPredicate(value,100.0))")

    def eventsDf(from: Int, n: Int): DataFrame = {
      val rnd = new Random(from)
      val types = Array("a", "b", "c", "d")
      import spark.implicits._
      spark.range(from, from + n).map { i =>
        val r = new Random(i)
        (i, types(r.nextInt(4)), i, s"u${i % Keys}", r.nextInt(200).toDouble)
      }.toDF("event_id", "event_type", "ts", "user_id", "value")
    }

    def writeSlices(slices: Seq[DataFrame]): java.nio.file.Path = {
      val srcDir = graft.queries.StreamScaffold.newScaffoldDir("graft-stream-src")
      val tmp = graft.queries.StreamScaffold.newScaffoldDir("graft-stream-slices")
      import scala.jdk.CollectionConverters._
      // child dir keeps tmp's owner-PID marker intact across overwrites
      val out = tmp.resolve("out")
      slices.zipWithIndex.foreach { case (df, i) =>
        df.coalesce(1).write.mode("overwrite").parquet(out.toString)
        val part = java.nio.file.Files.list(out).iterator().asScala
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

    def runOnce(srcDir: java.nio.file.Path, confs: Map[String, String])(
        transform: DataFrame => DataFrame): (Long, Double) = {
      val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val schema = spark.read.parquet(srcDir.toString).schema
        val ckpt = graft.queries.StreamScaffold.newScaffoldDir("graft-ckpt-grid")
        val sink = s"grid_${System.nanoTime()}"
        val q = transform(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(srcDir.toString))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .option("checkpointLocation", ckpt.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val batches = q.recentProgress.toSeq.filter(_.numInputRows > 0)
        spark.catalog.dropTempView(sink)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
        val last = batches.last
        if (sys.env.contains("GRID_DURATIONS")) {
          val dm = last.durationMs.asScala.toSeq.sortBy(-_._2.toLong)
            .map { case (k, v) => s"$k=${v}ms" }.mkString(" ")
          println(s"GRIDDUR $dm")
        }
        (last.numInputRows, last.durationMs.get("triggerExecution").toDouble / 1000.0)
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    def best(label: String, srcDir: java.nio.file.Path,
        confs: Map[String, String], attempts: Int = 2)(
        transform: DataFrame => DataFrame): Double = {
      var bestRate = 0.0
      for (_ <- 1 to attempts) {
        val (rows, secs) = runOnce(srcDir, confs)(transform)
        bestRate = math.max(bestRate, rows / secs)
      }
      println(f"GRID $label%-42s ${bestRate / 1e6}%6.2f M ev/s")
      bestRate
    }

    def toEvents(df: DataFrame) =
      Detect.toEvents(df, idCol = "event_id", typeCol = "event_type",
        tsCol = "ts", partitionCol = "user_id", numAttrs = Seq("value"))

    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val strEnc: Encoder[String] = Encoders.STRING
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[(String, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong)

    // no-op keyed-stateful op: same shuffle + sort + state-commit shape
    // as detections, zero engine work — isolates the plumbing share
    def noopStateful(df: DataFrame) =
      toEvents(df).groupByKey(_.partition)
        .flatMapGroupsWithState[Long, (String, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (key: String, rows: Iterator[CEvent], state: GroupState[Long]) =>
            var n = state.getOption.getOrElse(0L)
            rows.foreach(_ => n += 1)
            state.update(n)
            Iterator.single((key, n))
        }

    // the same no-op shape WITHOUT the CEvent attr maps: a narrow tuple
    // encode — isolates what the per-row Map construction costs
    def noopNarrow(df: DataFrame) = {
      implicit val rowEnc: Encoder[(Long, String, Long, String, Double)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
          Encoders.scalaLong, Encoders.STRING, Encoders.scalaDouble)
      df.selectExpr("cast(event_id as long)", "event_type",
          "cast(ts as long)", "user_id", "value")
        .as[(Long, String, Long, String, Double)]
        .groupByKey(_._4)
        .flatMapGroupsWithState[Long, (String, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (key: String, rows: Iterator[(Long, String, Long, String, Double)],
           state: GroupState[Long]) =>
            var n = state.getOption.getOrElse(0L)
            rows.foreach(_ => n += 1)
            state.update(n)
            Iterator.single((key, n))
        }
    }

    // r14 probe (VERDICT item 2): the partition key is the last
    // non-primitive in the keyed shuffle — does swapping the STRING
    // key for a hashed LONG move the plumbing ceiling? Same no-op
    // state shape as noopNarrow, only the groupByKey key type differs,
    // so the delta between the two rows IS the key-type cost (and an
    // upper bound on what a hashed-key detections path could gain).
    def noopNarrowLongKey(df: DataFrame) = {
      implicit val rowEnc: Encoder[(Long, String, Long, String, Double)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
          Encoders.scalaLong, Encoders.STRING, Encoders.scalaDouble)
      implicit val outEnc2: Encoder[(Long, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      df.selectExpr("cast(event_id as long)", "event_type",
          "cast(ts as long)", "user_id", "value")
        .as[(Long, String, Long, String, Double)]
        .groupByKey { r => // FNV-1a 64, zero-alloc
          val s = r._4; var h = -3750763034362895579L; var i = 0
          while (i < s.length) { h = (h ^ s.charAt(i)) * 1099511628211L; i += 1 }
          h
        }
        .flatMapGroupsWithState[Long, (Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (key: Long, rows: Iterator[(Long, String, Long, String, Double)],
           state: GroupState[Long]) =>
            var n = state.getOption.getOrElse(0L)
            rows.foreach(_ => n += 1)
            state.update(n)
            Iterator.single((key, n))
        }
    }

    val src1m = writeSlices(Seq(eventsDf(0, WarmRows), eventsDf(WarmRows, mainRows)))
    val hdfs = Map.empty[String, String]
    val rocks = Map("spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rocksCl = rocks + ("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")
    val sp32 = Map("spark.sql.shuffle.partitions" -> "32")

    val split16m = Map("spark.sql.files.maxPartitionBytes" -> (16L * 1024 * 1024).toString)

    def toES(df: DataFrame) =
      Detect.toEventStream(df, idCol = "event_id", typeCol = "event_type",
        tsCol = "ts", partitionCol = "user_id", numAttrs = Seq("value"))

    println(s"=== stage ladder ($master, ${mainRows / 1000000}M batch, hdfs store, 8 partitions; all stages emit tiny output)")
    best("noop stateful, narrow tuple (no maps)", src1m, hdfs)(df => noopNarrow(df).toDF())
    best("noop stateful, CEvent (attr maps)", src1m, hdfs)(df => noopStateful(df).toDF())
    best("full detections (Dataset[CEvent] compat)", src1m, hdfs)(df => Stream.detections(toEvents(df), cp).toDF())
    best("full detections (EventStream narrow)", src1m, hdfs)(df => Stream.detections(toES(df), cp).toDF())

    println(s"=== state store grid (detections, EventStream)")
    best("detections / rocksdb", src1m, rocks)(df => Stream.detections(toES(df), cp).toDF())
    best("detections / rocksdb+changelog", src1m, rocksCl)(df => Stream.detections(toES(df), cp).toDF())

    println(s"=== sizing grid (detections, EventStream)")
    best("detections / 32 shuffle partitions", src1m, sp32)(df => Stream.detections(toES(df), cp).toDF())
    best("detections / 16MB scan splits", src1m, split16m)(df => Stream.detections(toES(df), cp).toDF())
    val src4m = writeSlices(Seq(eventsDf(0, WarmRows), eventsDf(WarmRows, 4 * mainRows)))
    best("detections / 4M batch", src4m, hdfs)(df => Stream.detections(toES(df), cp).toDF())
    best("detections / 4M batch + 32p + 16MB splits", src4m, sp32 ++ split16m)(df => Stream.detections(toES(df), cp).toDF())
    best("detections CEvent / 4M + 32p + 16MB splits", src4m, sp32 ++ split16m)(df => Stream.detections(toEvents(df), cp).toDF())
    best("noop narrow / 4M + 32p + 16MB splits", src4m, sp32 ++ split16m)(df => noopNarrow(df).toDF())
    best("noop narrow LONG key / 4M + 32p + 16MB", src4m, sp32 ++ split16m)(df => noopNarrowLongKey(df).toDF())

    spark.stop()
  }
}
