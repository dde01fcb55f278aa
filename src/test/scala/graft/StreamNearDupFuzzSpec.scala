package graft

import graft.ops.{DedupOps, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** Randomized batch-boundary fuzz for p50's streaming ingestion
  * near-dup gate: random slice counts/sizes (id order preserved — the
  * op's ingestion contract), planted near-dup chains, and SMALL salt
  * caps so chunk resets — the edge the registered query can't reach at
  * BandBucketCap=1000 — fire routinely. The expected verdicts come from
  * an independent sequential replay of the salted-candidate semantics
  * (no micro-batching at all), so the spec proves batching is
  * invisible: state restores across boundaries and the per-batch
  * id-sort reproduces the global arrival order.
  */
class StreamNearDupFuzzSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("stream-neardup-fuzz")
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

  /** Corpus with planted near-dup chains: base docs of vocab tokens;
    * each chained copy perturbs ≤1 token of a 25-token doc (jaccard
    * ≥ 0.92 > the 0.9 threshold) under a fresh id later than its source.
    */
  private def corpus(rnd: scala.util.Random): Seq[(Long, String)] = {
    val vocab = Vector.tabulate(60)(i => s"w${i}x")
    def freshDoc() = Seq.fill(25)(vocab(rnd.nextInt(vocab.size)))
    val docs = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    for (_ <- 1 to (12 + rnd.nextInt(10))) {
      docs += freshDoc()
      // 50%: chain 1-3 near-copies of a random EARLIER doc
      if (rnd.nextBoolean() && docs.nonEmpty) {
        var t = docs(rnd.nextInt(docs.size))
        for (_ <- 1 to (2 + rnd.nextInt(4))) {
          t = if (rnd.nextBoolean())
            t.updated(rnd.nextInt(t.size), vocab(rnd.nextInt(vocab.size)))
          else t
          docs += t
        }
      }
    }
    docs.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toSeq
  }

  /** Sequential (batch-free) replay of the salted-candidate semantics:
    * docs in id order, each bucket keeps only its current cap-chunk.
    */
  private def replay(
      sigRows: Seq[(Long, Seq[Long], Seq[Long])],
      cap: Int, thr: Double): (Map[Long, Long], Int) = {
    val state = scala.collection.mutable.Map
      .empty[(Int, Long), (Long, Vector[(Long, Seq[Long])])]
    val best = scala.collection.mutable.Map.empty[Long, Long]
    var resets = 0
    for ((id, hashes, bands) <- sigRows.sortBy(_._1)) {
      var dupOf = -1L
      for ((key, band) <- bands.zipWithIndex) {
        val (n, chunk) = state.getOrElse((band, key), (0L, Vector.empty))
        val ms = chunk.collect {
          case (cid, ch) if DedupOps.jaccardJvm(ch, hashes) >= thr => cid
        }
        if (ms.nonEmpty) dupOf = if (dupOf < 0) ms.min else math.min(dupOf, ms.min)
        val nn = n + 1
        val next =
          if (nn % cap == 0) { resets += 1; Vector.empty[(Long, Seq[Long])] }
          else chunk :+ (id -> hashes)
        state((band, key)) = (nn, next)
      }
      best(id) = dupOf
    }
    (best.toMap, resets)
  }

  "streamingNearDup" should "equal the sequential salted replay under random slicing and chunk caps" in {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = sparkS.sqlContext
    var crossSlice = 0
    var resetsSeen = 0
    for (trial <- 1 to 8) {
      val rnd = new scala.util.Random(3000 + trial)
      // cycle caps deterministically: small caps MUST be hit for the
      // chunk-reset edge to be exercised every campaign
      val cap = Seq(2, 3, 5, 1000)(trial % 4)
      val docs = corpus(rnd)

      // signatures via the engine's own batch expressions — the replay
      // consumes them as opaque values, its logic is chunking + verify
      val sigRows = sparkS.createDataFrame(docs).toDF("doc_id", "text")
        .select(col("doc_id"),
          sort_array(TextOps.tokenHashes(col("text"))).as("hashes"))
        .withColumn("bands",
          DedupOps.bandKeys(DedupOps.minHashSig(col("hashes")), DedupOps.PairBands))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq, r.getSeq[Long](2).toSeq))
        .toSeq
      val (expected, resets) = replay(sigRows, cap, 0.9)
      resetsSeen += resets

      val slices = randomSlices(docs, rnd, maxChunks = 6)
      val mem = MemoryStream[(Long, String)]
      val q = DedupOps.streamingNearDup(
        mem.toDS().toDF("doc_id", "text"), "doc_id", "text", 0.9, cap)
        .writeStream.format("memory").queryName(s"fuzz_nd_$trial")
        .outputMode("append").start()
      slices.foreach { c => mem.addData(c); q.processAllAvailable() }
      val hits = sparkS.table(s"fuzz_nd_$trial")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      q.stop()
      sparkS.catalog.dropTempView(s"fuzz_nd_$trial")

      val got = hits.groupBy(_._1).map { case (id, hs) =>
        val m = hs.map(_._2).filter(_ >= 0)
        id -> (if (m.isEmpty) -1L else m.min)
      }
      withClue(s"trial $trial (cap=$cap, ${slices.size} slices, ${docs.size} docs): ") {
        got shouldBe expected
        expected.values.count(_ >= 0) should be >= 1 // planted dups found
      }
      // count matches whose source sits in an earlier slice (state
      // crossed a micro-batch boundary)
      val sliceOf = slices.zipWithIndex
        .flatMap { case (c, i) => c.map(d => d._1 -> i) }.toMap
      crossSlice += expected.count { case (id, src) => src >= 0 && sliceOf(src) < sliceOf(id) }
    }
    // the campaign must have actually exercised both target edges
    crossSlice should be >= 5
    resetsSeen should be >= 5
  }
}
