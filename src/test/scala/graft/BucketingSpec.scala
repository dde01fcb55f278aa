package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Bucketing = the pre-shuffle that makes repeated fact-fact joins
  * exchange-free: writing both sides bucketed on the join key lets the
  * SortMergeJoin read co-located buckets directly. At 100 TB this is the
  * difference between re-shuffling the fact table per query and never
  * shuffling it at all — asserted here on the physical plan.
  */
class BucketingSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val warehouse = Files.createTempDirectory("warehouse").toString

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("bucketing-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  it should "join bucketed fact tables without any exchange" in {
    val sf = "/root/testdata/sf0.001"
    spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_quantity", "o_totalprice")

    val plan = joined.queryExecution.executedPlan.toString
    plan should include("SortMergeJoin")
    "Exchange".r.findAllIn(plan).size shouldBe 0 // co-located buckets: no shuffle

    // and the same join WITHOUT bucketing shuffles both sides
    val unbucketed = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
    "Exchange".r.findAllIn(unbucketed.queryExecution.executedPlan.toString).size should be >= 2

    // correctness: bucketed join row count equals the plain join
    joined.count() shouldBe unbucketed.count()
  }
}
