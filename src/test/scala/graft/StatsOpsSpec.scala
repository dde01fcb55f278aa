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
      val denom = (BigInt(2) * nS * n / 1000000).max(BigInt(1))
      (src, nS.toLong, (total / denom).toLong)
    }.sortBy(_._1)
    val got = run("p66_source_drift").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe want
  }
}
