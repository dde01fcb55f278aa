package graft.cef

import graft.cef.adapt._
import graft.cef.spark.Inference
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** The complete RTCEF adaptation cycle over a LIVE Spark stream
  * (SURVEY.md §3.3): events flow through the streaming engine while the
  * Collector archives them; an optimize instruction pauses the engine;
  * the Controller drives 10 Bayesian evaluations in the Factory over the
  * stream-collected dataset; play deploys the argmin model and the engine
  * resumes with it — losslessly, mid-stream.
  */
class ClosedLoopSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("closed-loop-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cp = Compiler.compile(";(IsEventTypePredicate(a),IsEventTypePredicate(b))")

  private def ev(id: Long, t: String, ts: Long, key: String = "k") =
    CEvent(id, t, ts, key, Map.empty, Map.empty)

  it should "collect, pause, optimize over collected data, deploy, and resume" in {
    val sparkS = spark
    import sparkS.implicits._

    val tmp = Files.createTempDirectory("loop").toString
    val collector = new Collector(s"$tmp/collector", bucketSizeSec = 100L, lastK = 3)
    val factory = new Factory(cp, s"$tmp/models", order = 1)
    val controller = new Controller()
    val controls = new Inference.ControlHandle

    // model registry shared within the local JVM (executors == driver here)
    val models = new java.util.concurrent.ConcurrentHashMap[Int, (Spst, Map[(List[Int], Int), ForecastInterval])]()
    def register(id: Int, spst: Spst): Unit =
      models.put(id, (spst, spst.forecastTable(ForecastMethod.ClassifyNextK, 0.3, 10, 20)))
    // bootstrap model 0 from a seed dataset
    val seed = (1 to 100).map(i => ev(i.toLong, if (i % 2 == 0) "b" else "a", i.toLong))
    register(0, InMemory.train(seed, cp, order = 1, pMin = 0.001, gammaMin = 0.001))
    val loadModel: Int => (Spst, Map[(List[Int], Int), ForecastInterval]) = models.get(_)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CEvent]
    val q = Inference.engine(mem.toDS(), cp, loadModel, controls, swapDelay = 0L)
      .writeStream.format("memory").queryName("loop_out").outputMode("append").start()
    def outCount = spark.table("loop_out").count()

    // ---- phase 1: stream flows; the Collector archives the events.
    // Timestamps cross two bucket boundaries (buckets 1000, 1100 → rotation
    // notifications) so the factory receives a dataset.
    val phase1 = (1 to 120).map(i =>
      ev(i.toLong, if (i % 2 == 0) "b" else "a", 1000L + i * 2, s"k${i % 2}"))
    mem.addData(phase1)
    q.processAllAvailable()
    val afterPhase1 = outCount
    afterPhase1 should be > 0L

    val notifications = collector.processBatch(phase1)
    notifications should not be empty
    val ds = collector.readDataset(notifications.last)
    ds.size should be >= 50 // above the factory's MIN_DATA_THRESHOLD
    // the ACK echoes the notification's bucket range → the Collector's O6
    // GC can actually fire on old buckets
    val ack = factory.onNotification(notifications.last, ds)
    ack.bucketsRange shouldBe notifications.last.bucketsRange
    collector.onAck(ack) // deletes buckets older than the acked range

    // ---- phase 2: optimize instruction → pause reaches the live engine
    val ins = Instruction(0, 1300L, "optimize", "dynamic_v0", Map("f_val" -> -0.05))
    val out0 = controller.onInstruction(ins)
    out0.syncCommands.foreach(controls.push)
    mem.addData((200 to 230).map(i => ev(i.toLong, if (i % 2 == 0) "b" else "a", 1300L + i)))
    q.processAllAvailable()
    outCount shouldBe afterPhase1 // paused: nothing came out

    // ---- phase 3: the Controller drives the Factory over the collected
    // dataset (10 evaluations), finalises the argmin, and plays it
    var pending = out0.factoryCommands
    var play: Option[SyncCommand] = None
    var evals = 0
    while (play.isEmpty) {
      pending = pending.flatMap { cmd =>
        val rep = factory.onCommand(cmd)
        rep.reportType should not be "error"
        if (rep.reportType == "opt_step_done") evals += 1
        if (rep.reportType == "opt_finalised")
          register(rep.modelId + 1000, ModelStore.load(rep.modelPath))
        val o = controller.onFactoryReport(
          if (rep.reportType == "opt_finalised") rep.copy(modelId = rep.modelId + 1000) else rep)
        play = play.orElse(o.syncCommands.find(_.cmdType == "play"))
        o.factoryCommands
      }
    }
    evals shouldBe 10
    controls.push(play.get)

    // ---- phase 4: engine resumes with the deployed model; detections flow
    val phase4 = (300 to 340).map(i => ev(i.toLong, if (i % 2 == 0) "b" else "a", 1400L + i))
    mem.addData(phase4)
    q.processAllAvailable()
    val resumed = spark.table("loop_out").as[Inference.Out].collect()
    resumed.length.toLong should be > afterPhase1
    resumed.count(_.kind == "detection").toLong should be > 0L
    q.stop()

    // the deployed model is the optimizer's argmin candidate
    models.containsKey(play.get.modelId) shouldBe true
  }
}
