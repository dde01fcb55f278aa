package graft

import graft.ops.TextOps
import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** Distributed BPE merge learning vs a sequential reference replay of
  * Sennrich et al.'s algorithm (greedy left-to-right merge application,
  * frequency-weighted pair counts, (count DESC, lhs, rhs) tie-break).
  */
class BpeSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("bpe-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Sequential reference: word-frequency map → numMerges rounds of
    * (count pairs, pick argmax, greedily rewrite every word).
    */
  private def referenceBpe(
      corpus: Seq[String], numMerges: Int): Seq[(Long, String, String, String, Long)] = {
    var words: Map[List[String], Long] = corpus
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) => w.map(_.toString).toList -> g.size.toLong }
    def mergeWord(toks: List[String], l: String, r: String): List[String] = toks match {
      case a :: b :: rest if a == l && b == r => (l + r) :: mergeWord(rest, l, r)
      case a :: rest => a :: mergeWord(rest, l, r)
      case Nil => Nil
    }
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    for (step <- 1 to numMerges) {
      val counts = words.toSeq.flatMap { case (toks, f) =>
        toks.zip(toks.drop(1)).map(p => (p, f))
      }.groupBy(_._1).map { case (p, g) => (p, g.map(_._2).sum) }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((step.toLong, l, r, l + r, c))
        words = words.toSeq.map { case (toks, f) => (mergeWord(toks, l, r), f) }
          .groupBy(_._1).map { case (t, g) => (t, g.map(_._2).sum) }
      }
    }
    out.result()
  }

  private def runBpe(corpus: Seq[String], n: Int): Seq[(Long, String, String, String, Long)] = {
    val df = spark.createDataFrame(corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
    TextOps.bpeMerges(df, "text", n).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq
  }

  "bpeMerges" should "replay the sequential reference on a hand-checkable corpus" in {
    // 'aaab' stresses greedy overlap: merge (a,a) turns aaab into
    // [aa, a, b], NOT [aa, aa?]; the delimiter-wrapped replace must agree
    val corpus = Seq("aaab aaab banana", "banana banana band", "aaab and band and")
    val got = runBpe(corpus, 6)
    got shouldBe referenceBpe(corpus, 6)
  }

  it should "match the reference on the sf0.001 documents corpus" in {
    val texts = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("text").collect().map(_.getString(0)).toSeq
    val got = runBpe(texts, 10)
    got should have size 10
    got shouldBe referenceBpe(texts, 10)
  }

  it should "handle a corpus of single-character words (no pairs at all)" in {
    runBpe(Seq("a b c", "a a b"), 3) shouldBe empty
  }

  it should "exclude delimiter-containing words from the vocabulary" in {
    // 'a|b' would make the delimiter-wrapped state ambiguous ('|a||b|'
    // could mean [a, b] or the raw word); the contract excludes such
    // words up front, so learning must equal the reference run on the
    // corpus WITH those words removed — and the '|' words must not leak
    // pair counts (here 'x|x' repeated would otherwise dominate (x,x))
    val corpus = Seq("x|x x|x x|x x|x aaab banana", "banana band a|b", "aaab and band")
    val cleaned = corpus.map(_.split(" ").filterNot(_.contains("|")).mkString(" "))
    runBpe(corpus, 5) shouldBe referenceBpe(cleaned, 5)
  }

  it should "drop delimiter-containing words from encoding counts" in {
    val corpus = Seq("aa bb a|b", "aa aa cc")
    val merges = Seq(("a", "a"))
    val df = spark.createDataFrame(corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
    val got = TextOps.bpeEncode(df, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 0: 'a|b' excluded → 2 words, tokens: aa→1 (merged), bb→2
    // doc 1: 3 words, tokens: 1 + 1 + 2
    got.toSeq shouldBe Seq((0L, 2L, 3L), (1L, 3L, 4L))
  }

  private def runBpeBatched(
      corpus: Seq[String], n: Int, k: Int): Seq[(Long, String, String, String, Long)] = {
    val df = spark.createDataFrame(corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
    TextOps.bpeMergesBatched(df, "text", n, maxBatch = k).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq
  }

  "bpeMergesBatched" should "equal the sequential loop on the hand-checkable corpus at every batch size" in {
    val corpus = Seq("aaab aaab banana", "banana banana band", "aaab and band and")
    val want = referenceBpe(corpus, 6)
    for (k <- Seq(1, 2, 4, 8))
      withClue(s"maxBatch=$k: ") { runBpeBatched(corpus, 6, k) shouldBe want }
  }

  it should "equal the sequential loop on randomized tie-heavy corpora" in {
    // tiny alphabets make pair-count ties and symbol conflicts the
    // COMMON case, stressing exactly the two batch-acceptance rules
    // (symbol-disjoint prefix + strict dominance over the first reject)
    val rnd = new scala.util.Random(20260814)
    for (trial <- 1 to 8) {
      val alpha = "abcd".take(2 + rnd.nextInt(3))
      val corpus = Seq.fill(12 + rnd.nextInt(8)) {
        Seq.fill(3 + rnd.nextInt(5)) {
          Seq.fill(1 + rnd.nextInt(6))(alpha(rnd.nextInt(alpha.length))).mkString
        }.mkString(" ")
      }
      val want = referenceBpe(corpus, 8)
      val k = 1 + rnd.nextInt(5)
      withClue(s"trial $trial (alpha=$alpha, maxBatch=$k, corpus=$corpus): ") {
        runBpeBatched(corpus, 8, k) shouldBe want
      }
    }
  }

  it should "match the sequential loop on the sf0.001 documents corpus" in {
    val texts = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("text").collect().map(_.getString(0)).toSeq
    runBpeBatched(texts, 10, 4) shouldBe referenceBpe(texts, 10)
  }

  it should "not let a symbol-disjoint tied runner-up truncate the batch at a budget cut" in {
    // three disjoint pairs, all cnt 5; budget 2 accepts (a,b),(c,d) and
    // cuts at (e,f). The dominance bound must EXCLUDE the cut row — it
    // shares no symbol with the batch, its count is untouched by the
    // batch's merges, and it sorts after the rows it ties — so both
    // accepted merges ship in ONE round. (The earlier rule bounded by
    // the first rejected row regardless of reason, degrading this round
    // to a single merge.) Equality with the sequential loop is what
    // makes the wider batch LEGAL; the round count is what it buys.
    val corpus = Seq.fill(5)("ab cd ef").map(identity)
    val df = spark.createDataFrame(corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
    val want = referenceBpe(corpus, 3)
    val (got, rounds) = TextOps.bpeMergesBatchedCore(
      df, "text", 3, initTarget = 2, capTarget = 2)
    got.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq shouldBe want
    rounds shouldBe 2 // (ab, cd) in round 1, (ef) in round 2 — not 3
  }

  "bpeMergesAdaptive" should "equal the sequential loop on tie-heavy corpora at any (init, cap)" in {
    // the adaptive schedule changes WHICH rounds learn how many merges,
    // never the merges themselves — same acceptance rules, so the
    // tie/conflict-dense corpora that stress the fixed batcher stress it
    // identically; sweep odd (init, cap) pairs including cap = init
    val rnd = new scala.util.Random(20260815)
    for (trial <- 1 to 6) {
      val alpha = "abcd".take(2 + rnd.nextInt(3))
      val corpus = Seq.fill(12 + rnd.nextInt(8)) {
        Seq.fill(3 + rnd.nextInt(5)) {
          Seq.fill(1 + rnd.nextInt(6))(alpha(rnd.nextInt(alpha.length))).mkString
        }.mkString(" ")
      }
      val want = referenceBpe(corpus, 8)
      val init = 1 + rnd.nextInt(4)
      val cap = init + rnd.nextInt(12)
      val df = spark.createDataFrame(corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) })
        .toDF("doc_id", "text")
      val got = TextOps.bpeMergesAdaptive(df, "text", 8, initBatch = init, capBatch = cap)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
        .sortBy(_._1).toSeq
      withClue(s"trial $trial (alpha=$alpha, init=$init, cap=$cap, corpus=$corpus): ") {
        got shouldBe want
      }
    }
  }

  "bpeEncode" should "tokenize with the greedy merge semantics of the reference replay" in {
    val corpus = Seq("aaab aaab banana", "banana banana band", "aaab and band and")
    val merges = referenceBpe(corpus, 4).map(m => (m._2, m._3))
    val df = spark.createDataFrame(corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) })
      .toDF("doc_id", "text")
    val got = TextOps.bpeEncode(df, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // reference: greedily apply the merges per word, in order
    def enc(word: String): Long = {
      var toks = word.map(_.toString).toList
      for ((l, r) <- merges) {
        def go(ts: List[String]): List[String] = ts match {
          case a :: b :: rest if a == l && b == r => (l + r) :: go(rest)
          case a :: rest => a :: go(rest)
          case Nil => Nil
        }
        toks = go(toks)
      }
      toks.size.toLong
    }
    val want = corpus.zipWithIndex.map { case (t, i) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      (i.toLong, ws.length.toLong, ws.map(enc).sum)
    }
    got.toSeq shouldBe want
    // merging must never increase the token count below 1/word
    got.foreach { case (_, nw, nt) => nt should be >= nw }
  }
}
