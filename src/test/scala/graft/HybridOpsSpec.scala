package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** Behavioral specs for the round-10 pipeline additions: chunk-level
  * dedup (p52), hybrid RRF retrieval (p53), random projection (p54) and
  * the batch-perceptron quality classifier (p55) — each checked against
  * a hand-computed or independently-computed expectation.
  */
class HybridOpsSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("hybrid-ops-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // ------------------------------------------------------- p52 chunkDedup

  "DedupOps.chunkDedup" should "drop later occurrences of a shared chunk and reassemble in order" in {
    val s = spark; import s.implicits._
    // w=4 chunks; docs 1 and 2 share their first chunk exactly; doc 2's
    // copy must drop, and its text_clean must keep only the second chunk
    val boiler = "a b c d"
    val docs = Seq(
      (1L, s"$boiler e f g h"),
      (2L, s"$boiler x y z w"),
      (3L, "p q r") // single short chunk, unique
    ).toDF("doc_id", "text")
    val out = ops.DedupOps.chunkDedup(docs, "doc_id", "text", w = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    out shouldBe Array(
      (1L, 2L, 2L, "a b c d e f g h"),
      (2L, 2L, 1L, "x y z w"),
      (3L, 1L, 1L, "p q r"))
  }

  it should "keep the first occurrence WITHIN a document when a chunk repeats internally" in {
    val s = spark; import s.implicits._
    val docs = Seq((7L, "a b c d a b c d")).toDF("doc_id", "text")
    val out = ops.DedupOps.chunkDedup(docs, "doc_id", "text", w = 4)
      .as[(Long, Long, Long, String)].collect()
    out shouldBe Array((7L, 2L, 1L, "a b c d"))
  }

  it should "emit empty text_clean for a doc whose every chunk is boilerplate" in {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = ops.DedupOps.chunkDedup(docs, "doc_id", "text", w = 4)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    out shouldBe Array((1L, 1L, 1L, "a b"), (2L, 1L, 0L, ""))
  }

  // --------------------------------------------------- p53 hybridRrfTopK

  "SimilarityOps.hybridRrfTopK" should "rank a both-legs winner first and zero-mark single-leg ranks" in {
    val s = spark; import s.implicits._
    // query 0; candidate 1 is identical in BOTH token set and embedding
    // (rank 1 in both legs); candidate 2 is lexically close only;
    // candidate 3 is dense-close only; candidate 4 matches neither.
    def row(id: Long, text: String, e: Seq[Double]) =
      (id, text, e.map(_.toFloat))
    val corpus = Seq(
      row(1L, "alpha beta gamma delta", Seq(1.0, 0.0, 0.0)),
      row(2L, "alpha beta gamma zzz", Seq(0.0, 1.0, 0.0)),
      row(3L, "qqq rrr sss ttt", Seq(0.9, 0.1, 0.0)),
      row(4L, "uuu vvv www xxx", Seq(0.0, 0.0, 1.0))
    ).toDF("cand_id", "text", "e")
      .select(col("cand_id"), ops.TextOps.tokenHashes(col("text")).as("hashes"), col("e"))
    val q = Seq(row(0L, "alpha beta gamma delta", Seq(1.0, 0.0, 0.0)))
      .toDF("query_id", "text", "qe")
      .select(col("query_id"), ops.TextOps.tokenHashes(col("text")).as("qh"), col("qe"))
    val out = ops.SimilarityOps.hybridRrfTopK(q, corpus, depth = 2, k = 4)
      .orderBy("final_rank")
      .select("cand_id", "lex_rank", "cos_rank", "rrf_q", "final_rank")
      .as[(Long, Long, Long, Long, Long)].collect()
    // leg ranks: lex = (1:1, 2:2, rest 0), cos = (1:1, 3:2, rest 0)
    val c1 = 1000000000L / 61 * 2 // both legs rank 1
    val c2 = 1000000000L / 62 // one leg rank 2
    out.map(_._1) shouldBe Array(1L, 2L, 3L, 4L)
    out(0) shouldBe ((1L, 1L, 1L, c1, 1L))
    out(1) shouldBe ((2L, 2L, 0L, c2, 2L))
    out(2) shouldBe ((3L, 0L, 2L, c2, 3L))
    out(3) shouldBe ((4L, 0L, 0L, 0L, 4L))
  }

  // ------------------------------------------------------- p54 rpProject

  "SimilarityOps.rpProject" should "be linear and match a JVM-side replay of the sign matrix" in {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 20).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "e")
    val got = df.select(col("vec_id"), ops.SimilarityOps.rpProject(col("e"), 16).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    def signJvm(i: Int, j: Int): Double = {
      val m = 1000003L
      val k = (i * 31L + j + 7L) % m
      if ((k * k % m) * k % m % 2 == 0) 1.0 else -1.0
    }
    for ((id, e) <- vecs) {
      val want = (0 until 16).map { j =>
        var acc = 0.0
        var i = 0
        while (i < e.length) { acc += e(i).toDouble * signJvm(i, j); i += 1 }
        acc
      }
      got(id) shouldBe want // bit-exact: same fold order, same doubles
    }
    // linearity: rpProject(2e) == 2 * rpProject(e) exactly (×2 is exact
    // in binary floating point, and the fold is elementwise)
    val doubled = df.select(col("vec_id"),
      ops.SimilarityOps.rpProject(transform(col("e"), x => x * 2.0f), 16).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    for ((id, _) <- vecs)
      doubled(id) shouldBe got(id).map(_ * 2.0)
  }

  it should "use a decorrelated sign matrix (max |column corr| well below 1)" in {
    def signJvm(i: Int, j: Int): Int = {
      val m = 1000003L
      val k = (i * 31L + j + 7L) % m
      if ((k * k % m) * k % m % 2 == 0) 1 else -1
    }
    val d = 64; val dims = 16
    val maxCorr = (for {
      a <- 0 until dims; b <- 0 until dims if a != b
    } yield math.abs((0 until d).map(i => signJvm(i, a) * signJvm(i, b)).sum / d.toDouble)).max
    maxCorr should be < 0.5 // affine hashes measure 1.0 here
  }

  // ------------------------------------------------------ p56 substrScrub

  "DedupOps.substrScrub" should "cut later instances of a shared window and keep the first" in {
    val s = spark; import s.implicits._
    val shared = (1 to 4).map(i => s"s$i").mkString(" ") // one 4-token window
    val docs = Seq(
      (1L, s"$shared tail1 tail2"),
      (2L, s"head1 $shared tail3"),
      (3L, "u1 u2 u3 u4 u5")
    ).toDF("doc_id", "text")
    val out = ops.DedupOps.substrScrub(docs, "doc_id", "text", width = 4)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    out shouldBe Array(
      (1L, 6L, 0L, "s1 s2 s3 s4 tail1 tail2"), // first owner keeps its copy
      (2L, 6L, 4L, "head1 tail3"),
      (3L, 5L, 0L, "u1 u2 u3 u4 u5"))
  }

  it should "scrub WITHIN-document repeats and leave sub-width docs untouched" in {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "a b c d x a b c d"), // second occurrence of "a b c d" cut
      (2L, "p q r") // shorter than the window: no fingerprints at all
    ).toDF("doc_id", "text")
    val out = ops.DedupOps.substrScrub(docs, "doc_id", "text", width = 4)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    out shouldBe Array(
      (1L, 9L, 4L, "a b c d x"),
      (2L, 3L, 0L, "p q r"))
  }

  it should "match a brute-force scrub on random repetitive corpora" in {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(17)
    val words = Array("a", "b", "c", "d", "e")
    val width = 5
    val docs = (0 until 40).map { i =>
      (i.toLong, Array.fill(8 + rnd.nextInt(25))(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val got = ops.DedupOps.substrScrub(docs.toDF("doc_id", "text"), "doc_id", "text", width)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    // brute force: global first instance per window text, covered = union
    val wins = docs.flatMap { case (id, text) =>
      val t = text.split(" ")
      (0 to t.length - width).map(p => (t.slice(p, p + width).mkString(" "), id, p))
    }
    val byWin = wins.groupBy(_._1)
    val want = docs.map { case (id, text) =>
      val t = text.split(" ")
      val covered = Array.fill(t.length)(false)
      for {
        p <- 0 to t.length - width
        g = t.slice(p, p + width).mkString(" ")
        insts = byWin(g) if insts.size > 1
        firstEnc = insts.map { case (_, d, q) => d * 1000000L + q }.min
        if id * 1000000L + p > firstEnc
        k <- p until p + width
      } covered(k) = true
      val kept = t.indices.filterNot(covered).map(t)
      (id, t.length.toLong, covered.count(identity).toLong, kept.mkString(" "))
    }
    got.toSeq shouldBe want
  }

  // --------------------------------------------------- p57 cmHeavyHitters

  "SketchOps.cmHeavyHitters" should "never miss a true heavy hitter and flag CM false positives" in {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(3)
    // skewed stream: items z0..z4 hot, 400 rare items
    val occ = (0 until 2000).map { _ =>
      if (rnd.nextInt(3) == 0) s"z${rnd.nextInt(5)}" else s"r${rnd.nextInt(400)}"
    }
    val denom = 50L // heavy ⇔ cnt·50 > 2000 ⇔ cnt > 40
    val grams = occ.toDF("ngram")
    val out = ops.SketchOps.cmHeavyHitters(grams, denom,
        graft.queries.Pipeline.cmSeedsForSpec, 64) // small width forces FPs
      .as[(String, Long, Long, Boolean)].collect()
    val exact = occ.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val trueHeavy = exact.filter { case (_, c) => c * denom > occ.size }.keySet
    // no false negatives: every true heavy appears, flagged heavy, count exact
    val outMap = out.map(o => o._1 -> o).toMap
    trueHeavy.foreach { k =>
      outMap.keySet should contain(k)
      outMap(k)._4 shouldBe true
      outMap(k)._3 shouldBe exact(k)
    }
    // everything flagged heavy IS heavy; everything unflagged is a CM FP
    out.filter(_._4).map(_._1).toSet shouldBe trueHeavy
    out.filterNot(_._4).foreach { case (k, est, cnt, _) =>
      est should be >= cnt // CM never undercounts
      (cnt * denom <= occ.size) shouldBe true
    }
  }

  // ----------------------------------------------- p55 perceptronEpochs

  "ClassifierOps.perceptronEpochs" should "match a hand-rolled sequential batch perceptron" in {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(9)
    val rows = (1 to 200).map { _ =>
      val x1 = rnd.nextInt(50).toLong; val x2 = rnd.nextInt(10).toLong
      val x3 = rnd.nextInt(20).toLong
      val y = if (x1 + 3 * x2 > 30) 1L else -1L
      (1L, x1, x2, x3, y)
    }
    val feats = rows.toDF("x0", "x1", "x2", "x3", "y")
    val got = ops.ClassifierOps.perceptronEpochs(spark, feats, epochs = 4)
      .orderBy("epoch")
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    // reference: same batch rule, sequential
    var w = Array(0L, 0L, 0L, 0L)
    val want = (1 to 4).map { e =>
      val mis = rows.filter { case (x0, x1, x2, x3, y) =>
        (w(0) * x0 + w(1) * x1 + w(2) * x2 + w(3) * x3) * y <= 0
      }
      val d = mis.foldLeft(Array(0L, 0L, 0L, 0L)) { case (acc, (x0, x1, x2, x3, y)) =>
        Array(acc(0) + y * x0, acc(1) + y * x1, acc(2) + y * x2, acc(3) + y * x3)
      }
      w = Array(w(0) + d(0), w(1) + d(1), w(2) + d(2), w(3) + d(3))
      (e, w(0), w(1), w(2), w(3), mis.size.toLong)
    }
    got.toSeq shouldBe want
  }

  it should "report zero updates once the data is separated" in {
    val s = spark; import s.implicits._
    // trivially separable: y = sign of x1; one epoch finds it, later
    // epochs still count margin==0 rows as misclassified only if w·x==0
    val feats = Seq(
      (1L, 10L, 0L, 0L, 1L), (1L, -10L, 0L, 0L, -1L)
    ).toDF("x0", "x1", "x2", "x3", "y")
    val out = ops.ClassifierOps.perceptronEpochs(spark, feats, epochs = 3)
      .orderBy("epoch").as[(Int, Long, Long, Long, Long, Long)].collect()
    out(0)._6 shouldBe 2L // epoch 1 starts from 0 weights: everything "misclassified"
    out(1)._6 shouldBe 0L // separated: no updates from epoch 2 on
    out(1)._2 shouldBe out(2)._2
    out(1)._3 shouldBe out(2)._3
  }
}
