package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll
import scala.util.Random

/** Brute-force checks for the batch-5 statistics/sampling operators
  * (p63–p66, cef46). The driver oracle restates each in DuckDB; these
  * verify against an INDEPENDENT in-JVM recomputation (different code
  * path from both engines) and fuzz the streaming reservoir fold's
  * order-independence, which no single-ordering oracle can pin.
  */
class StatsOpsSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("stats-ops-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val rnd = new Random(63)

  private def docs(): Seq[(Long, String, String, String, Long)] = {
    val sparkS = spark
    import sparkS.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text", "lang", "source", "CAST(n_chars AS BIGINT)")
      .as[(Long, String, String, String, Long)].collect().toSeq
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  "mergeTopK" should "equal the global k-min for arbitrary micro-batch splits and orders" in {
    (1 to 200).foreach { _ =>
      val k = 1 + rnd.nextInt(8)
      val n = rnd.nextInt(60)
      val items = (1 to n).map(i => (rnd.nextInt(20).toLong, i.toLong))
      val want = items.distinct.sorted.take(k)
      // random shuffle, random split into batches, fold left
      val shuffled = rnd.shuffle(items)
      var batches = List.empty[Seq[(Long, Long)]]
      var rest = shuffled
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(rest.size)
        batches ::= rest.take(take); rest = rest.drop(take)
      }
      val got = batches.foldLeft(Seq.empty[(Long, Long)])(
        (acc, b) => ops.StatsOps.mergeTopK(acc, b, k))
      got shouldBe want
    }
  }

  "mgReduce folds" should "keep <= k counters and satisfy the Misra-Gries error bound under arbitrary splits" in {
    (1 to 200).foreach { _ =>
      val k = 1 + rnd.nextInt(5)
      val n = rnd.nextInt(200)
      // skewed item draw so real heavy hitters exist
      val stream = (1 to n).map(_ => s"i${math.min(rnd.nextInt(12), rnd.nextInt(12))}")
      val truth = stream.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
      // random split into batches, fold with exact per-batch counts
      var batches = List.empty[Seq[String]]
      var rest = stream
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(rest.size)
        batches ::= rest.take(take); rest = rest.drop(take)
      }
      var state = Seq.empty[(String, Long)]
      batches.reverse.foreach { b =>
        val counts = scala.collection.mutable.Map(state: _*)
        b.foreach(i => counts(i) = counts.getOrElse(i, 0L) + 1L)
        state = ops.StatsOps.mgReduce(counts.toMap, k)
        state.size should be <= k
      }
      // MG guarantee: true − n/(k+1) ≤ counter ≤ true (absent ⇒ 0)
      val est = state.toMap
      truth.foreach { case (i, t) =>
        val e = est.getOrElse(i, 0L)
        e should be <= t
        e should be >= t - n.toLong / (k + 1)
      }
      // counters never invent items
      est.keySet.subsetOf(truth.keySet) shouldBe true
    }
  }

  "decayStep folds" should "track the real-valued EWMA within the truncation bound and stay geometrically bounded" in {
    import ops.{StatsOps, DecayState}
    (1 to 50).foreach { _ =>
      val batches = Seq.fill(2 + rnd.nextInt(8))(
        Seq.fill(1 + rnd.nextInt(6))(rnd.nextInt(100).toLong))
      var st = DecayState(0L, 0L, 0L)
      for (b <- batches) st = StatsOps.decayStep(st, b.size.toLong, b.sum)
      // real-valued EWMA closed form: Σ_j x_j · 2^-(T-j). Each integer
      // step loses < 1 to truncation and carries prior error halved, so
      // the accumulated gap is < Σ 2^-i = 2 (and one-sided: truncation
      // only undershoots).
      val T = batches.size
      def ewma(xs: Seq[Long]): Double =
        xs.zipWithIndex.map { case (x, j) => x.toDouble / (1L << (T - 1 - j)) }.sum
      val realCnt = ewma(batches.map(_.size.toLong))
      val realSum = ewma(batches.map(_.sum))
      st.decCnt.toDouble should (be <= realCnt and be > realCnt - 2.0)
      st.decSum.toDouble should (be <= realSum and be > realSum - 2.0)
      // geometric bound: the carry can never exceed twice the largest
      // single-batch contribution (state is O(1) however long the stream)
      st.decCnt should be <= 2 * batches.map(_.size.toLong).max
      st.decSum should be <= 2 * batches.map(_.sum).max
      st.nSeen shouldBe batches.map(_.size.toLong).sum
    }
  }

  "p63_sample_weighted" should "equal the in-JVM sequential Poisson sample" in {
    val want = docs()
      .map { case (id, _, _, _, nc) =>
        val u = ops.TextOps.polyHashJvm(s"$id#graft-wsample-3")
        (u * ops.StatsOps.PriScale / math.max(nc, 1L), id, nc)
      }
      .sortBy(t => (t._1, t._2)).take(100)
      .map { case (pri, id, nc) => (id, nc, pri) }
    val got = run("p63_sample_weighted").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe want
  }

  "p64_contaminate_score" should "equal the in-JVM shingle containment scores" in {
    // the engines' shingle count is len − n (DedupOps.shingleHashesSql:
    // range(len(toks) − n)), i.e. the last window is intentionally
    // excluded — replicate that, not sliding's len − n + 1
    def shingles(text: String): Set[Long] = {
      val toks = text.split(" ", -1).toSeq
      (0 until math.max(toks.size - 3, 0))
        .map(i => ops.TextOps.polyHashJvm(toks.slice(i, i + 3).mkString(" "))).toSet
    }
    val all = docs()
    val bench: Set[Long] =
      all.filter(_._1 % 97 == 0).flatMap(d => shingles(d._2)).toSet
    val want = all.filter(_._1 % 97 != 0)
      .map { case (id, text, _, _, _) =>
        val sh = shingles(text)
        (id, sh.size.toLong, sh.count(bench.contains).toLong)
      }
      .filter(_._3 > 0)
      .map { case (id, ng, nh) => (id, ng, nh, nh * 1000000L / ng) }
      .sortBy(_._1)
    val got = run("p64_contaminate_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
  }

  "p65_group_quantiles" should "equal sort-based rank quantiles" in {
    val byLang = docs().groupBy(_._3)
    val want = (for {
      (lang, ds) <- byLang
      sorted = ds.map(_._5).sorted
      n = sorted.size.toLong
      pct <- Seq(25L, 50L, 90L, 99L)
    } yield {
      val rank = (pct * n + 99) / 100
      (lang, pct, n, sorted((rank - 1).toInt))
    }).toSeq.sortBy(t => (t._1, t._2))
    val got = run("p65_group_quantiles").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
  }

  "p66_source_drift" should "equal the exact BigInt L1 drift" in {
    val toks = docs().map { case (_, text, _, src, _) => (src, text.split(" ", -1).toSeq) }
    val bySrc = toks.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap(_._2).groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    }
    val corpus = bySrc.values.flatten
      .groupBy(_._1).map { case (w, cs) => w -> cs.map(_._2).sum }
    val n = BigInt(corpus.values.sum)
    val want = bySrc.toSeq.map { case (src, counts) =>
      val nS = BigInt(counts.values.sum)
      val present = counts.map { case (w, c) =>
        (BigInt(c) * n - BigInt(corpus(w)) * nS).abs
      }.sum
      // .keys is a Set — map+sum over it would collapse equal counts
      val cPres = BigInt(counts.keysIterator.map(corpus).sum)
      val total = present + (n - cPres) * nS
      (src, nS.toLong, (total * 1000000 / (BigInt(2) * nS * n)).toLong)
    }.sortBy(_._1)
    val got = run("p66_source_drift").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe want
  }

  "p66's decimal cross-multiplication" should "stay exact where int64 would wrap (the 100 TB count regime)" in {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions.expr
    // counts from a hypothetical 2e10-token corpus: c*n ≈ 1e20 > 2^63.
    // The term formula must match BigInt arithmetic, not wrap.
    val rows = Seq(
      (5000000000L, 1000000000L, 20000000000L, 4000000000L),
      (1234567890L, 9876543210L, 20000000000L, 4000000000L),
      (1L, 19999999999L, 20000000000L, 4000000000L))
    val got = rows.toDF("c", "ct", "n", "n_s")
      .select(expr(
        "CAST(abs(CAST(c AS DECIMAL(38,0)) * n - CAST(ct AS DECIMAL(38,0)) * n_s) AS STRING)")
        .as("term"))
      .as[String].collect().toSeq
    val want = rows.map { case (c, ct, n, ns) =>
      (BigInt(c) * n - BigInt(ct) * ns).abs.toString
    }
    got shouldBe want
    // and the final quantization div survives the same regime — the
    // divisor stays DECIMAL all the way into the single integral
    // divide (an inner `div` would truncate it through Long and wrap)
    val driftGot = rows.toDF("c", "ct", "n", "n_s")
      .select(expr(
        """(CAST(c AS DECIMAL(38,0)) * n * 1000000)
          |  div (2 * CAST(n_s AS DECIMAL(38,0)) * n)""".stripMargin).as("d"))
      .as[Long].collect().toSeq
    val driftWant = rows.map { case (c, _, n, ns) =>
      (BigInt(c) * n * 1000000 / (BigInt(2) * ns * n)).toLong
    }
    driftGot shouldBe driftWant
  }

  "p68_txt_collocations" should "equal the in-JVM Dice-scored bigram top-k" in {
    val toks = docs().map(_._2.split(" ", -1).toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val bc = toks.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).map { case (bg, bs) => bg -> bs.size.toLong }
      .filter(_._2 >= 5L)
    val want = bc.toSeq.map { case ((w1, w2), cxy) =>
      (w1, w2, cxy, 2L * cxy * 1000000L / (uni(w1) + uni(w2)))
    }.sortBy { case (w1, w2, _, d) => (-d, w1, w2) }.take(100)
    val got = run("p68_txt_collocations").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
  }

  "p69_dd_minhash_calibration" should "equal the in-JVM decile error table" in {
    import ops.{DedupOps, TextOps}
    // JVM twins of the signature chain. At sf0.001 (500 docs) no band
    // bucket can exceed BandBucketCap=1000, so salt is uniformly 0 and
    // candidates are exactly "share >= 1 band key".
    val sigs = docs()
      // the registered query's 1-in-4 seeded document sample
      .filter { case (id, _, _, _, _) =>
        TextOps.polyHashJvm(s"$id#graft-calib-9") % 4 == 0 }
      .map { case (id, text, _, _, _) =>
      val hs = text.split(" ", -1).map(TextOps.polyHashJvm).distinct.toSeq
      val sig = (0 until DedupOps.MinHashK).map(i =>
        if (hs.isEmpty) 0L
        else hs.map(h => (DedupOps.MinHashA(i) * h + DedupOps.MinHashB(i)) % TextOps.HashMod).min)
      val rows = DedupOps.MinHashK / DedupOps.NnBands
      val bands = (0 until DedupOps.NnBands).map(b =>
        (b * rows until (b + 1) * rows)
          .foldLeft(b.toLong)((acc, r) => (acc * 31 + sig(r)) % TextOps.HashMod))
      (id, hs.toSet, sig, bands)
    }
    val byBand = sigs.flatMap { case (id, _, _, bands) =>
      bands.zipWithIndex.map { case (key, b) => (b, key) -> id }
    }.groupBy(_._1)
    val cand = byBand.values.flatMap { ids =>
      val sorted = ids.map(_._2).sorted
      for {
        a <- sorted; b <- sorted
        if a < b
        // the registered query's deterministic 1-in-16 pair sample
        if ((a * 1000003L + b * 31L + 7L) % 1000000007L) % 16L == 0L
      } yield (a, b)
    }.toSet
    val bySig = sigs.map(s4 => s4._1 -> s4).toMap
    val errs = cand.toSeq.map { case (a, b) =>
      val (_, ha, sa, _) = bySig(a)
      val (_, hb, sb, _) = bySig(b)
      val inter = ha.intersect(hb).size.toLong
      val uniSz = math.max(ha.size + hb.size - inter, 1L)
      val jaccQ = inter * 1000000L / uniSz
      val estQ = sa.zip(sb).count { case (x, y) => x == y } * 15625L
      (jaccQ / 100000L, math.abs(estQ - jaccQ))
    }
    val want = errs.groupBy(_._1).toSeq.map { case (d, es) =>
      (d, es.size.toLong, es.map(_._2).sum / es.size)
    }.sortBy(_._1)
    val got = run("p69_dd_minhash_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe want
  }

  "p70_embed_pca" should "equal an independent BigInt moment + power iteration" in {
    import org.apache.spark.sql.functions._
    // quantized vectors come from the same double round/clamp both
    // engines share; the INDEPENDENT part of this check is everything
    // downstream — the upper-triangle moment accumulation and the
    // fixed-point iterations, recomputed here densely in BigInt
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(pmod(ops.TextOps.polyHash(
        concat(col("vec_id").cast("string"), lit("#graft-pca-11"))), lit(4L)) === 0)
    val gmax = emb.agg(max(aggregate(col("embedding"), lit(0.0),
      (a, x) => greatest(a, abs(x.cast("double")))))).collect()(0).getDouble(0)
    val scale = math.max(gmax, 1e-12) / 127.0
    val qvs = emb.select(expr(
      s"""transform(embedding,
         |  x -> CAST(least(greatest(round(CAST(x AS DOUBLE) / $scale), -127.0D),
         |                  127.0D) AS BIGINT))""".stripMargin).as("qv"))
      .collect().map(_.getSeq[Long](0).toArray)
    val d = qvs.head.length
    val m = Array.ofDim[BigInt](d, d)
    for (i <- 0 until d; j <- 0 until d) m(i)(j) = BigInt(0)
    qvs.foreach { q =>
      for (i <- 0 until d; j <- 0 until d) m(i)(j) += BigInt(q(i)) * q(j)
    }
    var v = Array.fill(d)(BigInt(1000000))
    for (_ <- 0 until 4) {
      val w = (0 until d).map(i => (0 until d).map(j => m(i)(j) * v(j)).sum).toArray
      val mx = w.map(_.abs).max.max(BigInt(1))
      v = w.map(x => x * 1000000 / mx)
    }
    val want = v.zipWithIndex.map { case (x, i) => (i.toLong, x.toLong) }.toSeq
    val got = run("p70_embed_pca").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    got shouldBe want
  }

  "p71_embed_outliers" should "equal the in-JVM bottom-k centroid-cosine scan" in {
    val sparkS = spark
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .orderBy(org.apache.spark.sql.functions.col("vec_id")).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray))
    // EXACTLY the engines' shared formula: sequential folds, then
    // dot / (sqrt(na) * sqrt(nb)) — not sqrt(na*nb), which can differ
    // in the last ulp and flip the ×10⁶ quantization
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cents = vecs.take(32)
    val want = vecs.map { case (id, e) =>
      val (bc, cid) = cents.map { case (cid0, ce) => (cos(e, ce), cid0) }
        .maxBy { case (c, cid0) => (c, -cid0) }
      (id, cid, math.floor(bc * 1000000 + 0.5).toLong)
    }.sortBy { case (id, _, q) => (q, id) }.take(50).toSeq
    val got = run("p71_embed_outliers").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe want
  }

  // p69's registered semantics are a two-level deterministic SAMPLE
  // (1-in-4 docs by seeded polyHash, then 1-in-16 of surviving pairs) —
  // the decile table is an estimate, not exhaustive counts. Pin that
  // both sample predicates are pure functions of (id, seed): stable
  // across evaluations/partitionings, and (r10 advice) the pair hash
  // stays overflow-free for ids far beyond the mod-p reduction point,
  // where the unreduced product would wrap in Spark and error in DuckDB.
  "p69's sample predicates" should "be deterministic in (id, seed) and overflow-free at huge ids" in {
    val sparkS = spark
    import sparkS.implicits._
    val p = 1000000007L
    val ids = Seq(0L, 1L, 7L, 999L, 1000000006L, 1000000008L,
      123456789012L, 9000000000000000000L, 9223372036854775807L)
    val pairs = for (a <- ids; b <- ids if a < b) yield (a, b)
    def pairExprOn(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
      "id_a", "id_b",
      s"(((id_a % $p) * 1000003 + (id_b % $p) * 31 + 7) % $p) % 16 AS s")
    val one = pairExprOn(pairs.toDF("id_a", "id_b").repartition(2)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val two = pairExprOn(pairs.toDF("id_a", "id_b").repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    one shouldBe two
    // BigInt reference: the reduced formula NEVER wraps (its Long result
    // equals exact integer arithmetic), even at Long.MaxValue ids
    pairs.foreach { case (a, b) =>
      val exact = (((BigInt(a) % p) * 1000003 + (BigInt(b) % p) * 31 + 7) % p) % 16
      withClue(s"pair ($a, $b): ") { one((a, b)) shouldBe exact.toLong }
    }
    // doc-level predicate: same hash for the same (id, seed) on every
    // evaluation; a different seed decorrelates
    val h1 = graft.ops.TextOps.polyHashJvm("123#graft-calib-9")
    h1 shouldBe graft.ops.TextOps.polyHashJvm("123#graft-calib-9")
    h1 should not be graft.ops.TextOps.polyHashJvm("123#graft-calib-8")
  }

  "foldHistogram" should "equal the whole-stream histogram for arbitrary splits, clamping strays" in {
    val q = 8
    (1 to 100).foreach { _ =>
      val n = rnd.nextInt(80)
      // include out-of-range buckets to exercise the clamp edges
      val buckets = (1 to n).map(_ => rnd.nextInt(q + 4) - 2)
      val want = {
        val a = Array.fill(q)(0L)
        buckets.foreach(b => a(math.min(math.max(b, 0), q - 1)) += 1L)
        a.toSeq
      }
      var batches = List.empty[Seq[Int]]
      var rest = rnd.shuffle(buckets)
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(rest.size)
        batches ::= rest.take(take); rest = rest.drop(take)
      }
      val got = batches.foldLeft(ops.StatsOps.foldHistogram(Nil, Nil, q))(
        (acc, b) => ops.StatsOps.foldHistogram(acc, b, q))
      got shouldBe want
    }
  }

  "cef48's quantile pick" should "equal sort-based bucket ranks (min bucket with cum >= p% of n)" in {
    // the pick rule shared by both engines: smallest bucket whose
    // cumulative count reaches p% of n_seen == the bucket holding the
    // ceil(p*n/100)-th smallest value
    (1 to 100).foreach { _ =>
      val n = 1 + rnd.nextInt(200)
      val buckets = (1 to n).map(_ => rnd.nextInt(64)).sorted
      val hist = buckets.groupBy(identity).view.mapValues(_.size.toLong).toMap
      for (p <- Seq(50, 90, 99)) {
        val viaRule = (0 until 64).find { b =>
          val cum = (0 to b).map(i => hist.getOrElse(i, 0L)).sum
          cum * 100 >= p.toLong * n
        }.get
        val viaSort = buckets((p * n + 99) / 100 - 1)
        viaRule shouldBe viaSort
      }
    }
  }

  "groupedMedianMadOutliers" should "equal brute-force median/MAD/outliers on random grouped data" in {
    val sparkS = spark
    import sparkS.implicits._
    for (trial <- 1 to 10) {
      val groups = 1 + rnd.nextInt(4)
      val rows = (1 to (20 + rnd.nextInt(300))).map { _ =>
        (s"g${rnd.nextInt(groups)}", (rnd.nextInt(50) + 1).toLong)
      }
      val got = graft.ops.StatsOps
        .groupedMedianMadOutliers(rows.toDF("k", "v"), "k", "v", 3)
        .select("k", "n", "sv", "med", "mad", "n_out")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      val exp = rows.groupBy(_._1).map { case (k, vs) =>
        def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
        val values = vs.map(_._2)
        val med = lowerMedian(values)
        val mad = lowerMedian(values.map(v => math.abs(v - med)))
        val nOut = values.count(v => math.abs(v - med) > 3 * mad)
        k -> ((values.size.toLong, values.sum, med, mad, nOut.toLong))
      }
      withClue(s"trial $trial: ") { got shouldBe exp }
    }
  }

  it should "handle empty and single-row groups at the edges" in {
    val sparkS = spark
    import sparkS.implicits._
    // empty input -> empty output (no rows, not a crash)
    graft.ops.StatsOps.groupedMedianMadOutliers(
      Seq.empty[(String, Long)].toDF("k", "v"), "k", "v", 3)
      .collect() shouldBe empty
    // one row: median = the value, MAD = 0, outliers = 0 (0 > 3*0 false)
    val one = graft.ops.StatsOps.groupedMedianMadOutliers(
      Seq(("a", 7L)).toDF("k", "v"), "k", "v", 3)
      .select("k", "n", "sv", "med", "mad", "n_out").collect()
    one.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))) shouldBe
      Array(("a", 1L, 7L, 7L, 0L, 0L))
    // two rows: lower median, every deviation equal -> mad = 0, the far
    // row IS an outlier under dev > 0
    val two = graft.ops.StatsOps.groupedMedianMadOutliers(
      Seq(("a", 1L), ("a", 100L)).toDF("k", "v"), "k", "v", 3)
      .select("k", "n", "sv", "med", "mad", "n_out").collect()
    two.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))) shouldBe
      Array(("a", 2L, 101L, 1L, 0L, 1L))
  }

  "cusumFold" should "be split-invariant at arbitrary micro-batch boundaries and equal the closed form" in {
    val rnd = new scala.util.Random(7712)
    (1 to 40).foreach { _ =>
      val xs = Seq.fill(2 + rnd.nextInt(60))(rnd.nextInt(40).toLong)
      val c = 1L + rnd.nextInt(30)
      val (single, sEnd) = graft.ops.StatsOps.cusumFold(0L, xs, c)
      // arbitrary split points: folding the pieces through the carried
      // state must reproduce the single-pass sequence exactly
      val cuts = (0 until xs.size).filter(_ => rnd.nextBoolean())
      val pieces = (Seq(0) ++ cuts ++ Seq(xs.size)).distinct.sorted
        .sliding(2).map { case Seq(a, b) => xs.slice(a, b) }.toSeq
      var st = 0L
      val stitched = pieces.flatMap { p =>
        val (vals, s1) = graft.ops.StatsOps.cusumFold(st, p, c)
        st = s1
        vals
      }
      stitched shouldBe single
      st shouldBe sEnd
      // and the recursion must equal the closed form the batch oracle
      // uses: S_t = P_t - min(0, running_min(P))
      val ps = xs.scanLeft(0L)((a, x) => a + x - c).tail
      val closed = ps.zipWithIndex.map { case (p, i) =>
        p - math.min(0L, ps.take(i + 1).min)
      }
      single shouldBe closed
    }
  }

  "sessFold" should "be split-invariant and equal the gaps-and-islands closed form" in {
    import graft.ops.{SessIn, SessState}
    val rnd = new scala.util.Random(5531)
    val gap = 100L
    (1 to 40).foreach { _ =>
      // strictly increasing timestamps with gaps straddling the
      // threshold, including the == boundary (NOT a break: > gap only)
      var ts = 0L
      val xs = (1 to (2 + rnd.nextInt(50))).map { i =>
        ts += (rnd.nextInt(4) match {
          case 0 => gap          // exactly the gap -> same session
          case 1 => gap + 1      // minimal break
          case _ => 1L + rnd.nextInt(80)
        })
        SessIn(1L, i.toLong, ts)
      }
      val (single, sEnd) = graft.ops.StatsOps.sessFold(SessState(Long.MinValue, -1L), xs, gap)
      // closed form: session_idx = (count of breaks so far) - 1
      var breaks = 0L
      val closed = xs.zipWithIndex.map { case (e, i) =>
        val isNew = i == 0 || e.ts_us - xs(i - 1).ts_us > gap
        if (isNew) breaks += 1
        (e.event_id, breaks - 1, isNew)
      }
      single.map(v => (v.event_id, v.session_idx, v.is_new)) shouldBe closed
      // arbitrary micro-batch splits through the carried state
      val cuts = (0 until xs.size).filter(_ => rnd.nextBoolean())
      val pieces = (Seq(0) ++ cuts ++ Seq(xs.size)).distinct.sorted
        .sliding(2).map { case Seq(a, b) => xs.slice(a, b) }.toSeq
      var st = SessState(Long.MinValue, -1L)
      val stitched = pieces.flatMap { p =>
        val (vals, s1) = graft.ops.StatsOps.sessFold(st, p, gap)
        st = s1
        vals
      }
      stitched shouldBe single
      st shouldBe sEnd
    }
  }
}
