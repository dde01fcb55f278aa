package graft

import graft.ops.AsofOps
import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** As-of join semantics: latest right row with rts <= lts per key,
  * tolerance bounds, equal-timestamp inclusion, missing-match nulls.
  */
class AsofSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("asof-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  it should "attach the latest right row at or before each left timestamp" in {
    val sparkS = spark
    import sparkS.implicits._
    val left = Seq(("k", 10L, "l1"), ("k", 25L, "l2"), ("k", 5L, "l3"), ("j", 10L, "l4"))
      .toDF("key", "tsu", "lname")
    val right = Seq(("k", 8L, 1.0), ("k", 10L, 2.0), ("k", 20L, 3.0), ("j", 50L, 9.0))
      .toDF("key", "tsu", "price")

    val out = AsofOps.asofJoin(left, right, "key", "tsu", Seq("price"))
      .select("key", "tsu", "lname", "asof_ts", "asof_price")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4)))).toSet

    out shouldBe Set(
      ("k", 10L, "l1", Some(10L), Some(2.0)), // equal ts: right included
      ("k", 25L, "l2", Some(20L), Some(3.0)), // latest ≤ 25 is 20
      ("k", 5L, "l3", None, None),            // nothing at or before 5
      ("j", 10L, "l4", None, None))           // j's right row is later
  }

  it should "null out matches outside the tolerance" in {
    val sparkS = spark
    import sparkS.implicits._
    val left = Seq(("k", 100L, "l1"), ("k", 30L, "l2")).toDF("key", "tsu", "lname")
    val right = Seq(("k", 20L, 1.0)).toDF("key", "tsu", "price")
    val out = AsofOps.asofJoin(left, right, "key", "tsu", Seq("price"), tolerance = 15L)
      .select("tsu", "asof_price")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    out shouldBe Set(
      (100L, None),      // 100-20 = 80 > 15
      (30L, Some(1.0)))  // 30-20 = 10 ≤ 15
  }

  it should "attach one coherent right row even when its values are null" in {
    val sparkS = spark
    import sparkS.implicits._
    // latest right row has a NULL price: the result must carry THAT row's
    // null, never backfill the price from an older row (row integrity)
    val left = Seq(("k", 10L, "l1")).toDF("key", "tsu", "lname")
    val right = Seq(("k", 1L, Some(5.0), 100L), ("k", 2L, None, 200L))
      .toDF("key", "tsu", "price", "rid")
    val r = AsofOps.asofJoin(left, right, "key", "tsu", Seq("price", "rid"))
      .select("asof_ts", "asof_price", "asof_rid").collect()(0)
    r.getLong(0) shouldBe 2L
    Option(r.get(1)) shouldBe None // c2's null, NOT c1's 5.0
    r.getLong(2) shouldBe 200L
  }

  it should "break equal-timestamp ties deterministically via tieBreakers" in {
    val sparkS = spark
    import sparkS.implicits._
    val left = Seq(("k", 10L, "l1")).toDF("key", "tsu", "lname")
    val right = Seq(("k", 10L, 1.0, 7L), ("k", 10L, 2.0, 3L))
      .toDF("key", "tsu", "price", "rid")
    val r = AsofOps.asofJoin(left, right, "key", "tsu", Seq("price", "rid"),
        tieBreakers = Seq("rid"))
      .select("asof_rid", "asof_price").collect()(0)
    // highest tiebreaker sorts last in the window → wins
    r.getLong(0) shouldBe 7L
    r.getDouble(1) shouldBe 1.0
  }
}
