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

  it should "handle a corpus smaller than the fusion depth" in {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (1L, "alpha beta", Seq(1.0f, 0.0f)),
      (2L, "gamma delta", Seq(0.0f, 1.0f))
    ).toDF("cand_id", "text", "e")
      .select(col("cand_id"), ops.TextOps.tokenHashes(col("text")).as("hashes"), col("e"))
    val q = Seq((0L, "alpha beta", Seq(1.0f, 0.0f))).toDF("query_id", "text", "qe")
      .select(col("query_id"), ops.TextOps.tokenHashes(col("text")).as("qh"), col("qe"))
    val out = ops.SimilarityOps.hybridRrfTopK(q, corpus, depth = 20, k = 10)
      .orderBy("final_rank")
      .select("cand_id", "lex_rank", "cos_rank", "final_rank")
      .as[(Long, Long, Long, Long)].collect()
    out shouldBe Array((1L, 1L, 1L, 1L), (2L, 2L, 2L, 2L))
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

  it should "match a brute-force chunk dedup on random corpora (incl. repeated docs)" in {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(23)
    val words = Array("a", "b", "c")
    val w = 3
    val docs = (0 until 50).map { i =>
      // small vocabulary + short chunks → many cross-doc chunk collisions
      (i.toLong, Array.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val got = ops.DedupOps.chunkDedup(docs.toDF("doc_id", "text"), "doc_id", "text", w)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    val chunksOf = (text: String) => text.split(" ").grouped(w).map(_.mkString(" ")).toVector
    val firstEnc = docs.flatMap { case (id, t) =>
      chunksOf(t).zipWithIndex.map { case (c, ix) => (c, id * 4294967296L + ix) }
    }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = docs.map { case (id, t) =>
      val cs = chunksOf(t)
      val kept = cs.zipWithIndex.collect {
        case (c, ix) if firstEnc(c) == id * 4294967296L + ix => c
      }
      (id, cs.size.toLong, kept.size.toLong, kept.mkString(" "))
    }
    got.toSeq shouldBe want
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
        firstEnc = insts.map { case (_, d, q) => d * 4294967296L + q }.min
        if id * 4294967296L + p > firstEnc
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

  // -------------------------------------------- p58 featureHashSparse

  "TextOps.featureHashSparse" should "match a JVM-side replay (buckets, signs, normalization)" in {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(5)
    val vocab = (0 until 40).map(i => s"w$i")
    val docs = (0 until 30).map { i =>
      (i.toLong, Array.fill(5 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val dims = 64
    val got = ops.TextOps.featureHashSparse(docs.toDF("doc_id", "text"), "doc_id", "text", dims)
      .orderBy("doc_id", "dim").as[(Long, Int, Long)].collect()
    def ph(sstr: String): Long = sstr.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val want = docs.flatMap { case (id, text) =>
      val v = Array.fill(dims)(0L)
      text.split(" ").foreach { tok =>
        val h = ph(tok)
        v((h % dims).toInt) += (if ((h / dims) % 2 == 0) 1L else -1L)
      }
      val norm2 = v.map(x => x * x).sum
      v.zipWithIndex.collect { case (x, d) if x != 0 =>
        (id, d, math.floor(x * 1000000.0 / math.sqrt(norm2.toDouble) + 0.5).toLong)
      }
    }
    got.toSeq shouldBe want
    // unit-norm within quantization: Σ q² ≈ 10¹²
    got.groupBy(_._1).values.foreach { rows =>
      val s2 = rows.map(r => r._3 * r._3).sum
      s2.toDouble shouldBe 1e12 +- 5e9
    }
  }

  // ------------------------------------------------------ p59 ingestGate

  "DedupOps.ingestGate" should "reject contained docs, accept novel ones, and count exactly" in {
    val s = spark; import s.implicits._
    val boiler = (1 to 32).map(i => s"b$i").mkString(" ") // 2 chunks of 16
    val existing = Seq((1L, boiler), (2L, "e1 e2 e3")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, boiler), // both chunks exist → reject
      (11L, (1 to 16).map(i => s"b$i").mkString(" ") + " " + (1 to 16).map(i => s"n$i").mkString(" ")), // 1 of 2 → borderline: 1*4 >= 2 → reject
      (12L, (1 to 40).map(i => s"x$i").mkString(" ")) // novel → accept
    ).toDF("doc_id", "text")
    val out = ops.DedupOps.ingestGate(existing, batch, "doc_id", "text",
        w = 16, bloomM = 4096, rejectDen = 4L)
      .orderBy("doc_id").as[(Long, Long, Long, Long, String)].collect()
    out.map(r => (r._1, r._2, r._4, r._5)) shouldBe Array(
      (10L, 2L, 2L, "reject"),
      (11L, 2L, 1L, "reject"), // 1·4 ≥ 2
      (12L, 3L, 0L, "accept"))
    // bloom soundness: n_probable always ≥ n_exact
    out.foreach(r => r._3 should be >= r._4)
  }

  it should "flag bloom false positives without rejecting (probable but not exact)" in {
    val s = spark; import s.implicits._
    // tiny 8-bit bloom: existing chunk sets bits that a different batch
    // chunk is likely to collide with across 3 hashes... use many
    // existing chunks to saturate the filter
    val existing = (0 until 40).map(i =>
      (i.toLong, (0 until 16).map(j => s"e${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val batch = Seq((100L, (0 until 16).map(j => s"novel$j").mkString(" "))).toDF("doc_id", "text")
    val out = ops.DedupOps.ingestGate(existing, batch, "doc_id", "text",
        w = 16, bloomM = 8, rejectDen = 4L)
      .as[(Long, Long, Long, Long, String)].collect()
    // 40 keys × 3 hashes into 8 bits saturates: the novel chunk IS
    // bloom-probable yet exactly absent — and the verdict stays accept
    out shouldBe Array((100L, 1L, 1L, 0L, "accept"))
  }

  // ----------------------------------------------------- p60 knn graph

  "SimilarityOps.lshTopKSalted" should "bound every (bucket, salt) block at the cap under adversarial pile-up" in {
    val s = spark; import s.implicits._
    // 700 identical vectors all land in ONE bucket — without the salt
    // the self-join is 700², with cap=100 it is 7 blocks of ≤100²
    val vecs = (1 to 700).map(i => (i.toLong, Seq(1.0f, 0.5f, 0.25f)))
      .toDF("vec_id", "embedding")
    val edges = ops.SimilarityOps.lshTopKSalted(vecs, k = 3, cap = 100)
    edges.count() shouldBe 700L * 3 // every vector still finds 3 neighbors
    // and no neighbor crosses a salt block: with id-ordered blocks of
    // 100, neighbors of id i stay within i's block
    val rows = edges.select("query_id", "neighbor_id").as[(Long, Long)].collect()
    rows.foreach { case (q, n) => (q - 1) / 100 shouldBe (n - 1) / 100 }
  }

  "p62_mix_select" should "fill each language's quota with the greedy quality prefix and never exceed it" in {
    val s = spark; import s.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("p62_mix_select")(spark, sfDir)
      .as[(Long, String, Long, Long)].collect()
    // recompute quotas + the full order independently
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        org.apache.spark.sql.functions.size(ops.TextOps.tokens(col("text")))
          .cast("long").as("n_tok"),
        ops.TextOps.countIn(ops.TextOps.tokens(col("text")), ops.TextOps.Stopwords)
          .cast("long").as("n_stop"))
      .as[(Long, String, Long, Long)].collect()
    val total = docs.map(_._3).sum
    val byLang = docs.groupBy(_._2)
    val numQ = byLang.view.mapValues(d =>
      math.floor(math.sqrt(d.size.toDouble / docs.length) * 1000000000L + 0.5).toLong).toMap
    val denom = numQ.values.sum
    val picked = out.groupBy(_._2)
    byLang.foreach { case (lang, ds) =>
      val quota = (total / 5) * numQ(lang) / denom
      val ordered = ds.map { case (id, _, nt, ns) => (ns * 1000000 / nt, id, nt) }
        .sortBy { case (sc, id, _) => (-sc, id) }
      // expected greedy prefix
      var cum = 0L
      val expect = ordered.takeWhile { case (_, _, nt) => { cum += nt; cum <= quota } }
        .map(_._2).toSet
      val got = picked.getOrElse(lang, Array.empty).map(_._1).toSet
      got shouldBe expect
      picked.getOrElse(lang, Array.empty).map(_._4).sum should be <= quota
    }
  }

  "p61_sim_recall_eval" should "emit one bounded row per probe query" in {
    val out = SparkEntry.queries("p61_sim_recall_eval")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.map(_._1).toSeq shouldBe (0L until 20L)
    out.foreach { case (_, hits, rq) =>
      hits should (be >= 0L and be <= 5L)
      rq shouldBe hits * 200000L
    }
    // the IVF index on this corpus is not degenerate: recall > 0 somewhere
    out.map(_._2).sum should be > 0L
  }

  "p60's mutual flag" should "be symmetric and consistent with the edge set" in {
    val out = SparkEntry.queries("p60_sim_knn_graph")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
    val edges = out.map(r => (r._1, r._2)).toSet
    out.foreach { case (a, b, _, mutual) =>
      mutual shouldBe edges.contains((b, a))
    }
    // at least some mutual pairs exist in the near-dup-rich corpus
    out.count(_._4) should be > 0
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

  it should "handle a single-class corpus (all labels +1) without stalling" in {
    val s = spark; import s.implicits._
    val feats = Seq(
      (1L, 5L, 1L, 0L, 1L), (1L, 9L, 2L, 1L, 1L), (1L, 3L, 0L, 2L, 1L)
    ).toDF("x0", "x1", "x2", "x3", "y")
    val out = ops.ClassifierOps.perceptronEpochs(spark, feats, epochs = 2)
      .orderBy("epoch").as[(Int, Long, Long, Long, Long, Long)].collect()
    // epoch 1 sums all rows (w=0 margins are 0); epoch 2: every margin
    // is positive under the summed weights, so nothing updates
    out(0) shouldBe ((1, 3L, 17L, 3L, 3L, 3L))
    out(1) shouldBe ((2, 3L, 17L, 3L, 3L, 0L))
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
