package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** r17: the streaming scaffolds drain their memory sinks through
  * Bridge.localCopy (InternalRow-layer copy into a LocalRelation)
  * instead of collect()+createDataFrame. This spec pins the copy's
  * contract: same schema, same values — across the type shapes the
  * sinks actually emit (longs, strings, doubles, timestamps, arrays,
  * structs, nulls) — and self-containment (the copy survives its
  * source view being dropped).
  */
class BridgeLocalCopySpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("bridge-localcopy-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  "Bridge.localCopy" should "preserve schema and values across mixed types" in {
    val df = spark.range(0, 50)
      .select(
        col("id"),
        when(col("id") % 7 === 0, lit(null)).otherwise(concat(lit("s"), col("id"))).as("s"),
        (col("id") * 1.5).as("d"),
        timestamp_seconds(col("id") * 1000).as("ts"),
        array(col("id"), col("id") + 1).as("arr"),
        struct(col("id").as("a"), (col("id") % 3).as("b")).as("st"))
    val copy = org.apache.spark.sql.graftbridge.Bridge.localCopy(df)
    copy.schema shouldBe df.schema
    copy.collect().map(_.toString).toSeq shouldBe df.collect().map(_.toString).toSeq
  }

  it should "be self-contained after the source temp view is dropped" in {
    spark.range(0, 10).selectExpr("id", "id * 2 AS v")
      .createOrReplaceTempView("bridge_copy_src")
    val copy = org.apache.spark.sql.graftbridge.Bridge.localCopy(
      spark.table("bridge_copy_src"))
    spark.catalog.dropTempView("bridge_copy_src")
    copy.count() shouldBe 10
    copy.agg(sum(col("v"))).collect()(0).getLong(0) shouldBe 90L
    // and it is a LOCAL relation: no file scan, no exchange
    val plan = copy.queryExecution.executedPlan.toString
    plan should include("LocalTableScan")
  }
}
