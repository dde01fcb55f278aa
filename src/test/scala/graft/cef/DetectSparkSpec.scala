package graft.cef

import graft.cef.spark.Detect
import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** Spark batch operator specs: the distributed per-key scan must equal the
  * direct driver-side run, including the multi-pattern single-pass variant.
  */
class DetectSparkSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("detect-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def mkEvents: Seq[CEvent] = {
    val rnd = new scala.util.Random(9)
    val types = Vector("a", "b", "c")
    (1 to 200).map(i =>
      CEvent(i.toLong, types(rnd.nextInt(3)), i.toLong * 7, s"u${rnd.nextInt(4)}",
        Map.empty, Map.empty))
  }

  it should "run multiple patterns in a single distributed pass" in {
    val sparkS = spark
    import sparkS.implicits._
    val events = mkEvents
    val cps = SreParser.parseAll(
      """;(IsEventTypePredicate(a),IsEventTypePredicate(b))
        |&
        |#(;(IsEventTypePredicate(c),IsEventTypePredicate(a)))""".stripMargin)
      .map(Compiler.compilePattern(_))

    val multi = Detect.detectionsMulti(events.toDS(), cps).collect().toSet

    // must equal running each pattern separately
    val separate = cps.zipWithIndex.flatMap { case (cp, i) =>
      Detect.detections(events.toDS(), cp).collect().map(i -> _)
    }.toSet
    multi shouldBe separate
    multi.map(_._1) shouldBe Set(0, 1) // both patterns fired somewhere
  }
}
