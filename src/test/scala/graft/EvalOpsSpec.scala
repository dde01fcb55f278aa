package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll
import scala.util.Random

/** Brute-force checks for the batch-7 operators (p73 ROC-AUC, p74 KMV
  * source overlap, p75 canonical keep). The driver oracle restates each
  * in DuckDB; these verify against an INDEPENDENT in-JVM recomputation
  * (pairwise AUC, set-algebra KMV, union-find) — a third code path with
  * none of the shared SQL/DataFrame formulas.
  */
class EvalOpsSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("eval-ops-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val rnd = new Random(73)

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def docs(): Seq[(Long, String, String, Long)] = {
    val sparkS = spark
    import sparkS.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text", "source", "CAST(n_chars AS BIGINT)")
      .as[(Long, String, String, Long)].collect().toSeq
  }

  /** O(n⁺·n⁻) pairwise AUC: 2·wins counts a strict win 2 and a tie 1. */
  private def bruteAucQ(rows: Seq[(Long, Long)]): (Long, Long, Long) = {
    val pos = rows.collect { case (sc, 1L) => sc }
    val neg = rows.collect { case (sc, -1L) => sc }
    val (np, nn) = (pos.size.toLong, neg.size.toLong)
    if (np == 0 || nn == 0) (np, nn, -1L)
    else {
      var tw = 0L
      for (p <- pos; n <- neg) tw += (if (p > n) 2L else if (p == n) 1L else 0L)
      (np, nn, tw * 1000000L / (2L * np * nn))
    }
  }

  "rocAucQ" should "equal the pairwise definition under heavy score ties" in {
    val sparkS = spark
    import sparkS.implicits._
    (1 to 15).foreach { _ =>
      val data = (1 to 3).flatMap { g =>
        val n = 5 + rnd.nextInt(40)
        // scores drawn from a 6-value universe to force tie groups
        (1 to n).map(_ =>
          (g, rnd.nextInt(6).toLong - 2L, if (rnd.nextBoolean()) 1L else -1L))
      }
      val got = ops.ClassifierOps
        .rocAucQ(data.toDF("g", "score", "y"), "g", "score", "y")
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      data.groupBy(_._1).foreach { case (g, rows) =>
        got(g) shouldBe bruteAucQ(rows.map(r => (r._2, r._3)))
      }
    }
  }

  it should "report -1 for a single-class group and 10^6 for a perfect ranking" in {
    val sparkS = spark
    import sparkS.implicits._
    val data = Seq(
      (1, 5L, 1L), (1, 4L, 1L), // group 1: all positive
      (2, 9L, 1L), (2, 8L, 1L), (2, 1L, -1L), (2, 0L, -1L)) // group 2: separable
    val got = ops.ClassifierOps
      .rocAucQ(data.toDF("g", "score", "y"), "g", "score", "y")
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    got(1) shouldBe -1L
    got(2) shouldBe 1000000L
  }

  // JVM twin of the shared perceptron feature/label formulas (split
  // keeps empty tokens, as Spark's split and DuckDB's string_split do)
  private def feats(text: String): (Long, Long, Long, Long, Long) = {
    val toks = text.split(" ", -1).toSeq
    val x1 = toks.size.toLong
    val x2 = toks.count(ops.TextOps.Stopwords.contains).toLong
    val x3 = toks.count(_.length >= 6).toLong
    val y = if (x1 >= 20 && x2 > 0) 1L else -1L
    (1L, x1, x2, x3, y)
  }

  "p73_quality_auc" should "match an in-JVM perceptron + pairwise AUC on real docs" in {
    val fs = docs().map(d => feats(d._2))
    var w = Array(0L, 0L, 0L, 0L)
    val want = (1 to 3).map { e =>
      val mis = fs.filter { case (x0, x1, x2, x3, y) =>
        (w(0) * x0 + w(1) * x1 + w(2) * x2 + w(3) * x3) * y <= 0
      }
      w = Array(
        w(0) + mis.map(f => f._5 * f._1).sum,
        w(1) + mis.map(f => f._5 * f._2).sum,
        w(2) + mis.map(f => f._5 * f._3).sum,
        w(3) + mis.map(f => f._5 * f._4).sum)
      val scored = fs.map { case (x0, x1, x2, x3, y) =>
        (w(0) * x0 + w(1) * x1 + w(2) * x2 + w(3) * x3, y)
      }
      val (np, nn, auc) = bruteAucQ(scored)
      (e, np, nn, auc)
    }
    val got = run("p73_quality_auc").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe want
  }

  private def polyHash(s: String): Long = ops.TextOps.polyHashJvm(s)

  "p74_source_overlap" should "match set-algebra KMV merges on real docs" in {
    val k = 256
    val bySource: Map[String, Seq[Long]] = docs()
      .groupBy(_._3)
      .map { case (src, ds) =>
        src -> ds.flatMap(_._2.split(" ", -1)).map(polyHash).distinct.sorted.take(k)
      }
    val srcs = bySource.keys.toSeq.sorted
    val want = for {
      a <- srcs; b <- srcs if a < b
    } yield {
      val (sa, sb) = (bySource(a).toSet, bySource(b).toSet)
      val merged = (sa ++ sb).toSeq.sorted.take(k)
      val nBoth = merged.count(h => sa(h) && sb(h)).toLong
      (a, b, merged.size.toLong, nBoth, nBoth * 1000000L / merged.size)
    }
    val got = run("p74_source_overlap").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    got shouldBe want
    // sanity: at least one source pair shares vocabulary on this corpus
    got.exists(_._4 > 0) shouldBe true
  }

  "p75_dd_canonical" should "agree with union-find over the registered pair set" in {
    val ds = docs()
    val chars = ds.map(d => d._1 -> d._4).toMap
    val pairs = run("p06_dd_minhash_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]() ++ ds.map(d => d._1 -> d._1)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val groups = ds.map(_._1).groupBy(find)
    val want = groups.collect { case (_, members) if members.size >= 2 =>
      val gid = members.min
      val keep = members.maxBy(id => (chars(id), -id))
      val sumChars = members.map(chars).sum
      (gid, keep, members.size.toLong, chars(keep), sumChars - chars(keep))
    }.toSeq.sortBy(_._1)
    val got = run("p75_dd_canonical").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    got shouldBe want
    // the sf0.001 corpus must actually exercise the multi-doc branch
    want.nonEmpty shouldBe true
  }
}
