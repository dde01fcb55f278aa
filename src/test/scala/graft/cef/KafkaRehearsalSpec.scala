package graft.cef

import graft.cef.adapt._
import graft.cef.spark.{Inference, Kafka}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Kafka wiring rehearsal (S1-S4/S9): the full topic topology driven
  * through file-backed streams under Trigger.AvailableNow with the EXACT
  * JSON contracts of the reference's seven topics (InferenceJob.java:
  * 120-208, ModelFactoryJob.java:53-125, Makefile:277-291). Only the
  * `format("kafka")` line is swapped for a text source — parsing, id
  * assignment, the engine, and the control dispatch are the production
  * code paths.
  */
class KafkaRehearsalSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("kafka-rehearsal-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def topicDir(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("topic")
    Files.write(dir.resolve("part-00000.txt"), lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  "the maritime_input plane" should "run value strings through parse → events → engine under AvailableNow" in {
    val sparkS = spark
    import sparkS.implicits._

    // two vessels, alternating fast/slow fixes → strict (speed>8, speed<1)
    // pairs: 15 detections per vessel
    val lines = (1 to 60).map { i =>
      val speed = if (((i - 1) / 2) % 2 == 0) 9.0 else 0.5
      s"""{"timestamp": ${1000 + i}, "mmsi": "m${i % 2}", "lon": 1.0, "lat": 2.0, "speed": $speed, "trh": 0.0, "critical_bitstring": "00000000"}"""
    }
    val dir = topicDir(lines)

    val cp = Compiler.compile(";(GTPredicate(speed,8.0),LTPredicate(speed,1.0))")
    val train = (1 to 200).map { i =>
      CEvent(i.toLong, "SampledCritical", i.toLong, "t",
        Map("speed" -> (if (i % 2 == 1) 9.0 else 0.5)), Map.empty)
    }
    val spst = InMemory.train(train, cp, order = 1, pMin = 0.001, gammaMin = 0.001)
    val table = spst.forecastTable(ForecastMethod.ClassifyNextK, 0.3, 10, 20)

    // file stream stands in for Kafka.eventSource; the id expression plays
    // the (offset, partition) role (unique, ts-tiebreaking only)
    val raw = spark.readStream.text(dir)
    val events = Kafka.maritimeEventStream(raw, xxhash64(col("value")))
    val controls = new Inference.ControlHandle
    val q = Inference.engine(events, cp, _ => (spst, table), controls)
      .writeStream.format("memory").queryName("rehearsal_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val out = spark.table("rehearsal_out").as[Inference.Out].collect().toSeq
    out.count(_.kind == "detection") shouldBe 30
    out.count(_.kind == "forecast") shouldBe 60 // order-1 buffer: every event
    out.map(_.partition).toSet shouldBe Set("m0", "m1")
  }

  "the control plane" should "dispatch the multi-topic (enginesync + model_reports) stream into the handle" in {
    val syncDir = topicDir(Seq(SyncCommand.play(5L, -1).toJson))
    val reportDir = topicDir(Seq(
      FactoryReport("r1", "trained", 7, "/models/7", Map("mcc" -> 0.5)).toJson))

    // the controlSource shape: one stream over both topics with the topic
    // column kept for dispatch
    val ctl = spark.readStream.text(syncDir).select(lit("enginesync").as("topic"), col("value"))
      .union(spark.readStream.text(reportDir).select(lit("model_reports").as("topic"), col("value")))

    val handle = new Inference.ControlHandle
    val q = ctl.writeStream.foreachBatch(Kafka.controlDispatch(handle) _)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // play resumed the engine; the trained report registered model 7
    // (order-insensitive: play(-1) keeps whatever the report registered)
    handle.current.paused shouldBe Some(false)
    handle.current.latestModelId shouldBe 7

    // pause arriving in a later batch flips only the paused flag
    val sparkS = spark
    import sparkS.implicits._
    val batch = Seq(("enginesync", SyncCommand.pause(9L).toJson)).toDF("topic", "value")
    Kafka.controlDispatch(handle)(batch, 1L)
    handle.current.paused shouldBe Some(true)
    handle.current.latestModelId shouldBe 7
  }

  "every adaptation topic schema" should "round-trip through a file-backed stream read" in {
    val instruction = Instruction(1, 5L, "optimize", "m7", Map("mcc" -> 0.12))
    val cmdOpt = FactoryCommand("opt_step", "cmd-1", 3, 2, 7L, Some(List(0.001, 0.002)), 1)
    val cmdTrain = FactoryCommand("train", "cmd-2", 4, 0, 8L, None, -1)
    val sync = SyncCommand.pause(3L)
    val report = FactoryReport("r9", "trained", 2, "/m/2", Map("mcc" -> 0.4))
    val notification = DatasetNotification(5, "/buckets", List(3L, 4L, 5L), 2, 9L, 3)
    val ack = AssemblyAck(5, 2, List(3L, 4L, 5L))

    val topics: Seq[(String, Seq[String])] = Seq(
      "observer_instructions" -> Seq(instruction.toJson),
      "factory_commands" -> Seq(cmdOpt.toJson, cmdTrain.toJson),
      "enginesync" -> Seq(sync.toJson),
      "model_reports" -> Seq(report.toJson),
      "dataset_versions" -> Seq(notification.toJson),
      "assembly_reports" -> Seq(ack.toJson))

    val union = topics.map { case (t, lines) =>
      spark.readStream.text(topicDir(lines)).select(lit(t).as("topic"), col("value"))
    }.reduce(_ union _)

    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val q = union.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => got.add(r.getString(0) -> r.getString(1)))
    }.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    import scala.jdk.CollectionConverters._
    val byTopic = got.asScala.toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    byTopic.keySet shouldBe topics.map(_._1).toSet

    Instruction.fromJson(byTopic("observer_instructions").head) shouldBe instruction
    byTopic("factory_commands").map(FactoryCommand.fromJson).toSet shouldBe Set(cmdOpt, cmdTrain)
    SyncCommand.fromJson(byTopic("enginesync").head) shouldBe sync
    FactoryReport.fromJson(byTopic("model_reports").head) shouldBe report
    DatasetNotification.fromJson(byTopic("dataset_versions").head) shouldBe notification
    AssemblyAck.fromJson(byTopic("assembly_reports").head) shouldBe ack
  }
}
