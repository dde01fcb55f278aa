package graft

import graft.ops.PackOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** Randomized batch-boundary fuzz for p105's streaming ingest-time
  * packer: random micro-batch slicing (id order preserved — the
  * ingestion contract), random token counts including docs LARGER than
  * the budget (the occupy-a-bin-alone edge), and several bucket counts.
  * Three independent forms must agree exactly: the streaming GroupState
  * packer, the batch mapPartitions packer (p31), and a plain sequential
  * replay of the greedy recurrence. The campaign also requires that
  * some bin genuinely SPANS a micro-batch boundary — the open-bin
  * cursor restored from state, not recomputed.
  */
class PackStreamSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("pack-stream-fuzz")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def randomSlices[T](xs: Seq[T], rnd: scala.util.Random, maxChunks: Int): Seq[Seq[T]] = {
    val n = xs.size
    val k = 2 + rnd.nextInt(maxChunks - 1)
    val cuts = Seq.fill(k - 1)(1 + rnd.nextInt(math.max(1, n - 1))).distinct.sorted
    val bounds = 0 +: cuts :+ n
    bounds.sliding(2).map { case Seq(a, b) => xs.slice(a, b) }.filter(_.nonEmpty).toSeq
  }

  /** The greedy recurrence, sequentially, no Spark anywhere. */
  private def replay(
      docs: Seq[(Long, Long)], buckets: Int, budget: Long): Map[Long, (Long, Long)] = {
    val state = scala.collection.mutable.Map.empty[Long, (Long, Long)] // bucket -> (bin, fill)
    docs.sortBy(_._1).map { case (id, nTok) =>
      val bucket = id % buckets
      val (bin, fill) = state.getOrElse(bucket, (0L, 0L))
      val next =
        if (fill > 0L && fill + nTok > budget) (bin + 1L, nTok)
        else (bin, fill + nTok)
      state(bucket) = next
      id -> (bucket, next._1)
    }.toMap
  }

  "streamingPack" should "equal the batch packer and the sequential replay under random slicing" in {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    var crossSliceBins = 0
    for (trial <- 1 to 6) {
      val rnd = new scala.util.Random(5200 + trial)
      val buckets = Seq(1, 3, 4)(trial % 3)
      val budget = Seq(64L, 100L)(trial % 2)
      val docs = Seq.tabulate(40 + rnd.nextInt(40)) { i =>
        // ~10% oversized docs exercise the occupy-alone edge
        val n = if (rnd.nextInt(10) == 0) budget + 1 + rnd.nextInt(40)
        else 1L + rnd.nextInt(50)
        (i.toLong, n)
      }
      val expected = replay(docs, buckets, budget)

      val batch = PackOps.packGreedy(
          sparkS.createDataFrame(docs).toDF("doc_id", "n_tok"),
          "doc_id", "n_tok", buckets, budget)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap

      val slices = randomSlices(docs, rnd, maxChunks = 6)
      val mem = MemoryStream[(Long, Long)]
      val q = PackOps.streamingPack(
          mem.toDS().toDF("doc_id", "n_tok"), "doc_id", "n_tok", buckets, budget)
        .writeStream.format("memory").queryName(s"fuzz_pack_$trial")
        .outputMode("append").start()
      slices.foreach { c => mem.addData(c); q.processAllAvailable() }
      val streamed = sparkS.table(s"fuzz_pack_$trial")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
      q.stop()
      sparkS.catalog.dropTempView(s"fuzz_pack_$trial")

      withClue(s"trial $trial (buckets=$buckets, budget=$budget, ${slices.size} slices): ") {
        batch shouldBe expected
        streamed shouldBe expected
      }
      // bins that received docs from two different slices: the open-bin
      // cursor must have crossed a micro-batch boundary
      val sliceOf = slices.zipWithIndex
        .flatMap { case (c, i) => c.map(d => d._1 -> i) }.toMap
      crossSliceBins += expected.groupBy(_._2).values
        .count(g => g.keys.map(sliceOf).toSet.size > 1)
    }
    crossSliceBins should be >= 5
  }

  /** Quota replay: per-source running totals, hard cutoff. */
  private def quotaReplay(
      docs: Seq[(Long, String, Long)], quota: Long): Map[Long, Boolean] = {
    val cum = scala.collection.mutable.Map.empty[String, Long]
    docs.sortBy(_._1).map { case (id, src, nTok) =>
      val c = cum.getOrElse(src, 0L) + nTok
      cum(src) = c
      id -> (c <= quota)
    }.toMap
  }

  "streamingTokenQuota" should "equal the sequential per-source cutoff replay under random slicing" in {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    var crossSliceCutoffs = 0
    for (trial <- 1 to 5) {
      val rnd = new scala.util.Random(6100 + trial)
      val quota = Seq(40L, 90L, 200L)(trial % 3)
      val docs = Seq.tabulate(50 + rnd.nextInt(40)) { i =>
        (i.toLong, s"src${rnd.nextInt(4)}", 1L + rnd.nextInt(20))
      }
      val expected = quotaReplay(docs, quota)

      val slices = randomSlices(docs, rnd, maxChunks = 6)
      val mem = MemoryStream[(Long, String, Long)]
      val q = PackOps.streamingTokenQuota(
          mem.toDS().toDF("doc_id", "source", "n_tok"),
          "doc_id", "source", "n_tok", quota)
        .writeStream.format("memory").queryName(s"fuzz_quota_$trial")
        .outputMode("append").start()
      slices.foreach { c => mem.addData(c); q.processAllAvailable() }
      val streamed = sparkS.table(s"fuzz_quota_$trial")
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      q.stop()
      sparkS.catalog.dropTempView(s"fuzz_quota_$trial")

      withClue(s"trial $trial (quota=$quota, ${slices.size} slices): ") {
        streamed shouldBe expected
        expected.values.count(_ == false) should be >= 1 // quota actually binds
      }
      // sources whose cutoff doc sits in a later slice than their first
      // doc: the running total crossed a micro-batch boundary
      val sliceOf = slices.zipWithIndex
        .flatMap { case (c, i) => c.map(d => d._1 -> i) }.toMap
      val bySrc = docs.groupBy(_._2)
      crossSliceCutoffs += bySrc.values.count { ds =>
        val rejected = ds.filter(d => !expected(d._1))
        rejected.nonEmpty &&
          sliceOf(rejected.minBy(_._1)._1) > sliceOf(ds.minBy(_._1)._1)
      }
    }
    crossSliceCutoffs should be >= 5
  }
}
