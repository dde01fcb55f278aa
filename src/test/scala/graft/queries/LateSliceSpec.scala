package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** r17: cef40's LATE slice set is now DERIVED from the cached non-late
  * slice files (Cef.deriveLateFrom) instead of a second global-window
  * build. This spec pins derive ≡ direct: for every slice index, the
  * derived file holds exactly the rows (and the row ORDER — the file
  * source replays files as written, and the direct build wrote global
  * (ts, event_id) order) the direct `buildSlices(late = true)` build
  * produces.
  */
class LateSliceSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("late-slice-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  "deriveLateFrom" should "reproduce the direct late build file-for-file, row-for-row" in {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = java.nio.file.Paths.get(s"$sfDir/events.parquet")
      .toAbsolutePath.normalize.toString
    val base = Cef.buildSlices(spark, path)
    val direct = Cef.buildSlices(spark, path, late = true)
    val derived = Cef.deriveLateFrom(spark, path, base)
    try {
      var n = 0
      java.nio.file.Files.list(direct).iterator().forEachRemaining { f =>
        val name = f.getFileName.toString
        if (name.endsWith(".parquet")) {
          n += 1
          val a = spark.read.parquet(f.toString).collect().map(_.toString).toSeq
          val b = spark.read.parquet(derived.resolve(name).toString)
            .collect().map(_.toString).toSeq
          withClue(s"slice $name: ") {
            b shouldBe a
          }
        }
      }
      n should be >= 3
    } finally {
      for (d <- Seq(base, direct, derived)) {
        StreamScaffold.untrack(d)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      }
    }
  }
}
