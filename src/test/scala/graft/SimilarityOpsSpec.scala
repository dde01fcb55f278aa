package graft

import graft.ops.SimilarityOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** The trained-codebook IVF path: Lloyd rounds must produce a valid
  * codebook behind the same (c_id, c_emb) interface, improve (or at least
  * not worsen) the quantizer's objective vs the deterministic seeds, and
  * plug into ivfTopK unchanged.
  */
class SimilarityOpsSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("simops-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def emb = Tables(spark, sfDir, "embeddings")

  /** Mean max-cosine of every corpus vector to its nearest centroid —
    * the (spherical) quantizer objective. */
  private def objective(cent: org.apache.spark.sql.DataFrame): Double =
    emb.crossJoin(broadcast(cent))
      .withColumn("cc", SimilarityOps.cosine(col("embedding"), col("c_emb")))
      .groupBy(col("vec_id")).agg(max(col("cc")).as("best"))
      .agg(avg(col("best"))).head.getDouble(0)

  "lloydCentroids" should "train a valid codebook that improves on the seeds" in {
    val k = 8
    val seed = emb.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("c_id"), col("embedding").cast("array<double>").as("c_emb"))
    val trained = SimilarityOps.lloydCentroids(emb, numCentroids = k, iters = 4)

    trained.count() shouldBe k
    val dims = trained.select(expr("size(c_emb)")).distinct().collect().map(_.getInt(0))
    dims shouldBe Array(64)
    // Lloyd rounds must not worsen the quantizer objective
    objective(trained) should be >= objective(seed) - 1e-9
  }

  "semDedup" should "match a driver-side brute-force replay of the cluster-local keep rule" in {
    val tau = 0.95
    val k = 8
    val got = SimilarityOps.semDedup(emb, tau = tau, numCentroids = k)
      .collect().map(r => (r.getAs[Long]("vec_id"),
        (r.getAs[Long]("cluster"),
         Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong),
         r.getAs[Boolean]("kept")))).toMap

    // brute force: same seed centroids, argmax assignment (ties → lower
    // centroid id), then the order-free lower-id keep rule per cluster
    val vecs = emb.orderBy(col("vec_id")).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val cents = vecs.take(k)
    val assign = vecs.map { case (id, e) =>
      val best = cents.map { case (cid, ce) => (cos(e, ce), cid) }
        .maxBy { case (c, cid) => (c, -cid) }._2
      id -> best
    }.toMap
    vecs.foreach { case (id, e) =>
      val mates = vecs.filter { case (oid, _) => oid < id && assign(oid) == assign(id) }
      val dups = mates.filter { case (_, oe) => cos(e, oe) >= tau }.map(_._1)
      val expDup = if (dups.isEmpty) None else Some(dups.min)
      withClue(s"vec $id: ") {
        got(id) shouldBe ((assign(id), expDup, expDup.isEmpty))
      }
    }
  }

  "semDedup" should "handle planted exact-duplicate chains (random vectors)" in {
    val rnd = new scala.util.Random(83)
    val base = (0 until 60).map { i =>
      (i.toLong * 3, Array.fill(16)(rnd.nextGaussian().toFloat))
    }
    // plant exact duplicates of every 5th vector at two higher ids —
    // all three share a cluster (identical vectors assign identically),
    // and both copies must point dup_of at the FIRST id
    val dups = base.filter(_._1 % 15 == 0).flatMap { case (id, v) =>
      Seq((id + 1, v.clone()), (id + 2, v.clone()))
    }
    val rows = (base ++ dups).sortBy(_._1)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) =>
        org.apache.spark.sql.Row(id, v.toSeq)
      }, 3),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))))
    val out = SimilarityOps.semDedup(df, tau = 0.999999, numCentroids = 8)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong)).toMap
    dups.foreach { case (id, _) =>
      val anchor = (id / 15) * 15
      withClue(s"dup $id: ") { out(id) shouldBe Some(anchor) }
    }
    // anchors themselves survive (cosine 1.0 only to HIGHER ids)
    base.filter(_._1 % 15 == 0).foreach { case (id, _) =>
      withClue(s"anchor $id: ") { out(id) shouldBe None }
    }
  }

  "pqTopK" should "match a driver-side replay of encode + ADC ranking" in {
    val m = 8; val ks = 16; val k = 5
    val got = SimilarityOps.pqTopK(emb, emb.filter(col("vec_id") < 10), k = k)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc"))).toMap

    val vecs = emb.orderBy(col("vec_id")).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](r.fieldIndex("embedding")).toArray))
    val dsub = vecs.head._2.length / m
    def sub(v: Array[Float], s: Int): Array[Float] = v.slice(s * dsub, (s + 1) * dsub)
    // element-order double accumulation, matching l2sq
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }
    val cents = vecs.take(ks).map(_._2) // c_code = index (vec_id order)
    val codes = vecs.map { case (id, v) =>
      id -> (0 until m).map { s =>
        (0 until ks).minBy(c => (d2(sub(v, s), sub(cents(c), s)), c))
      }
    }.toMap
    vecs.filter(_._1 < 10).foreach { case (qid, qv) =>
      val lut = Array.tabulate(m, ks)((s, c) => d2(sub(qv, s), sub(cents(c), s)))
      val ranked = vecs.filter(_._1 != qid).map { case (nid, _) =>
        // fold in subspace order, same as the sorted-struct aggregate
        (nid, (0 until m).foldLeft(0.0)((acc, s) => acc + lut(s)(codes(nid)(s))))
      }.sortBy { case (nid, adc) => (adc, nid) }.take(k)
      ranked.zipWithIndex.foreach { case ((nid, adc), i) =>
        withClue(s"query $qid rank ${i + 1}: ") {
          got((qid, i + 1)) shouldBe ((nid, adc))
        }
      }
    }
  }

  it should "keep the dim % m remainder dimensions in the last subspace" in {
    // dim=10, m=4 → dsub=2, the last subspace spans dims 6..9. The first
    // 8 dims are IDENTICAL across all vectors; only dims 8-9 (the
    // remainder pair the old geometry silently dropped) carry signal, so
    // a truncating implementation would see every corpus vector
    // equidistant and rank by neighbor_id instead of true distance.
    val m = 4; val ks = 4
    val base = Array.fill(8)(1.0f)
    def vec(tail0: Float, tail1: Float) = base ++ Array(tail0, tail1)
    val rows = Seq(
      0L -> vec(0f, 0f), 1L -> vec(10f, 10f), 2L -> vec(20f, 20f),
      3L -> vec(30f, 30f), 4L -> vec(29.5f, 29.5f), 5L -> vec(29f, 29f))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) =>
        org.apache.spark.sql.Row(id, v.toSeq)
      }, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))))
    val got = SimilarityOps.pqTopK(df, df.filter(col("vec_id") === 4L),
        k = 2, m = m, ks = ks)
      .orderBy(col("rnk")).collect()
      .map(r => r.getAs[Long]("neighbor_id"))
    // Centroids = vecs 0..3 (seed rule); query 4's tail sits next to
    // centroid 3's, and vecs 3 and 5 both encode to c3 in the last
    // subspace, so the ADC ranking is (3, 5). A truncating geometry sees
    // every distance as 0 and ranks (0, 1) by id — the test fails loudly.
    got.toSeq shouldBe Seq(3L, 5L)
  }

  it should "return an empty frame on an empty corpus (no codebook to collect)" in {
    // the map-side rewrite collects the codebook driver-side; an empty
    // corpus must degrade to an empty result like the join form did,
    // not throw on cents.head
    val none = emb.filter(col("vec_id") < 0)
    val out = SimilarityOps.pqTopK(none, none, k = 3)
    out.columns.toSeq shouldBe Seq("query_id", "neighbor_id", "adc", "rnk")
    out.count() shouldBe 0L
  }

  it should "plug a Lloyd-trained codebook into semDedup unchanged" in {
    val trained = SimilarityOps.lloydCentroids(emb, numCentroids = 8, iters = 2)
    val out = SimilarityOps.semDedup(emb, tau = 0.95, centroids = Some(trained))
    out.count() shouldBe emb.count()
    // keep rule invariants hold under ANY quantizer: dup_of is a strictly
    // lower id, and kept <=> no dup_of
    out.collect().foreach { r =>
      val dupOf = Option(r.getAs[java.lang.Long]("dup_of"))
      r.getAs[Boolean]("kept") shouldBe dupOf.isEmpty
      dupOf.foreach(_.toLong should be < r.getAs[Long]("vec_id"))
    }
  }

  it should "plug into ivfTopK behind the same interface" in {
    val trained = SimilarityOps.lloydCentroids(emb, numCentroids = 8, iters = 2)
    val res = SimilarityOps.ivfTopK(
      emb, emb.filter(col("vec_id") < 5), k = 3,
      numCentroids = 8, nProbe = 2, centroids = Some(trained))
    val rows = res.collect()
    rows.map(_.getAs[Long]("query_id")).distinct.length shouldBe 5
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      g.map(_.getAs[Int]("rnk")).sorted shouldBe Array(1, 2, 3)
    }
  }

  "cosineJvm" should "be bit-identical to the fused Catalyst expression" in {
    val sparkS = spark
    import sparkS.implicits._
    val rnd = new scala.util.Random(8711)
    val pairs = Seq.fill(200)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val fromExpr = pairs.toDF("a", "b")
      .select(SimilarityOps.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    val fromJvm = pairs.map { case (a, b) => SimilarityOps.cosineJvm(a, b) }
    fromExpr.zip(fromJvm).foreach { case (e, j) =>
      java.lang.Double.doubleToLongBits(e) shouldBe java.lang.Double.doubleToLongBits(j)
    }
  }

  it should "agree with the expression on zero-norm input and throw on dimension mismatch" in {
    val sparkS = spark
    import sparkS.implicits._
    // zero-norm → 0.0 on BOTH paths (r13 advice: the expression used to
    // emit NaN here, silently diverging from the driver-side twin)
    val zero = Seq.fill(8)(0f)
    val unit = 1f +: Seq.fill(7)(0f)
    SimilarityOps.cosineJvm(zero, unit) shouldBe 0.0
    SimilarityOps.cosineJvm(unit, zero) shouldBe 0.0
    SimilarityOps.cosineJvm(zero, zero) shouldBe 0.0
    val exprVals = Seq((zero, unit), (unit, zero), (zero, zero))
      .toDF("a", "b")
      .select(SimilarityOps.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    exprVals.foreach(_ shouldBe 0.0)
    // mismatched length: the driver path fails loudly (the expression
    // twin iterates the shorter length — documented departure)
    an[IllegalArgumentException] should be thrownBy
      SimilarityOps.cosineJvm(Seq(1f, 2f), Seq(1f, 2f, 3f))
  }

  "kCenterCoreset" should "match a sequential farthest-first replay on random buckets" in {
    val sparkS = spark
    import sparkS.implicits._
    val rnd = new scala.util.Random(9321)
    val vecs = Seq.tabulate(120)(i => (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = SimilarityOps.kCenterCoreset(df, buckets = 5, k = 4)
      .collect().map(p => (p.bucket, p.step) -> (p.center_id, p.dist_q)).toMap

    // sequential replay, no Spark
    val expected = vecs.groupBy(_._1 % 5).flatMap { case (bkt, vs0) =>
      val vs = vs0.sortBy(_._1)
      var chosen = vs.head
      var remaining = vs.tail
      val minD = scala.collection.mutable.Map.empty[Long, Double]
      val picks = scala.collection.mutable.ArrayBuffer(
        (bkt, 1L) -> (chosen._1, -1L))
      var step = 2
      while (step <= 4 && remaining.nonEmpty) {
        remaining.foreach { v =>
          val d = 1.0 - SimilarityOps.cosineJvm(v._2, chosen._2)
          if (d < minD.getOrElse(v._1, Double.MaxValue)) minD(v._1) = d
        }
        val next = remaining.maxBy(v => (minD(v._1), -v._1))
        picks += (bkt, step.toLong) -> (next._1,
          math.floor(minD(next._1) * 1000000 + 0.5).toLong)
        chosen = next
        remaining = remaining.filterNot(_._1 == next._1)
        step += 1
      }
      picks
    }
    got shouldBe expected
    // farthest-first property: within a bucket, selection distances
    // never increase (each pick is the current farthest point)
    got.keys.map(_._1).toSeq.distinct.foreach { bkt =>
      val ds = (2 to 4).map(s => got((bkt, s.toLong))._2)
      ds shouldBe ds.sorted.reverse
    }
  }

  "ivfTopKSweep" should "reproduce ivfTopK exactly at every probe setting from one shared pass" in {
    val q = emb.filter(col("vec_id") < 10)
    val probes = Seq(1, 2, 4, 8)
    val swept = SimilarityOps.ivfTopKSweep(emb, q, k = 5, probes = probes)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3).toLong))
      .groupBy(_._1)
      .view.mapValues(_.map(t => (t._2, t._3, t._4)).toSet).toMap
    probes.foreach { p =>
      val solo = SimilarityOps.ivfTopK(emb, q, k = 5, nProbe = p)
        .select(col("query_id"), col("neighbor_id"), col("rnk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
      withClue(s"nProbe=$p: ") { swept(p.toLong) shouldBe solo }
    }
    // prefix candidates: results at a larger setting can only re-rank a
    // SUPERSET, so per-query hit sets grow monotonically in aggregate
    val sizes = probes.map(p => swept(p.toLong).size)
    sizes shouldBe sizes.sorted
  }
}
