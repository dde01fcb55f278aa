package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll
import scala.util.Random

/** Brute-force oracles for the graph family (p83/p84). The driver gate
  * checks the ops over the LSH-derived mutual-kNN graph; these check the
  * primitives themselves on random symmetric graphs — including shapes
  * the corpus graph rarely produces (isolated edges, long paths whose
  * peel takes every round, stars whose center survives peeling of all
  * leaves).
  */
class GraphOpsSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("graph-ops-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val rnd = new Random(83)

  /** Random undirected graph as a symmetric directed edge list. */
  private def randomEdges(n: Int, m: Int): Seq[(Long, Long)] = {
    val und = scala.collection.mutable.Set.empty[(Long, Long)]
    while (und.size < m) {
      val a = rnd.nextInt(n).toLong
      val b = rnd.nextInt(n).toLong
      if (a != b) und += ((math.min(a, b), math.max(a, b)))
    }
    und.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
  }

  private def brutePagerank(edges: Seq[(Long, Long)], iters: Int, scale: Long,
                            dampNum: Int, dampDen: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    val teleport = (dampDen - dampNum).toLong * scale
    var r = out.keys.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, ns) <- out; v <- ns) contrib(v) += r(u) / ns.size
      r = out.keys.map(v => v -> (teleport + dampNum.toLong * contrib(v)) / dampDen).toMap
    }
    r
  }

  /** Reference peel: recompute alive-degrees each round, drop < k. */
  private def brutePeel(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Int] = {
    val adj = edges.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var alive = adj.keySet
    val peeled = scala.collection.mutable.Map.empty[Long, Int]
    for (i <- 1 to rounds) {
      val next = alive.filter(v => adj(v).count(alive) >= k)
      for (v <- alive -- next) peeled(v) = i
      alive = next
    }
    adj.keys.map(v => v -> peeled.getOrElse(v, 0)).toMap
  }

  "GraphOps.pagerank" should "match brute-force integer PageRank on random graphs" in {
    val sparkS = spark
    import sparkS.implicits._
    (1 to 4).foreach { _ =>
      val es = randomEdges(40, 60)
      val df = es.toDF("a", "b")
      val got = ops.GraphOps.pagerank(df, 3, 1000000000000L, 85, 100)
        .select("v", "pr_q").as[(Long, Long)].collect().toMap
      got shouldBe brutePagerank(es, 3, 1000000000000L, 85, 100)
    }
  }

  it should "conserve a teleport-consistent total and rank a hub above leaves" in {
    val sparkS = spark
    import sparkS.implicits._
    // star: center 0 <-> leaves 1..6; each leaf sends its whole rank to
    // the center, the center splits across 6
    val es = (1L to 6L).flatMap(l => Seq((0L, l), (l, 0L)))
    val r = ops.GraphOps.pagerank(es.toDF("a", "b"), 3, 1000000000000L, 85, 100)
      .select("v", "pr_q").as[(Long, Long)].collect().toMap
    r(0L) should be > r(1L)
    (1L to 6L).map(r).toSet.size shouldBe 1 // leaves are symmetric
  }

  "GraphOps.corePeel" should "match brute-force k-core peeling on random graphs" in {
    val sparkS = spark
    import sparkS.implicits._
    (1 to 4).foreach { _ =>
      val es = randomEdges(40, 55)
      val df = es.toDF("a", "b")
      val got = ops.GraphOps.corePeel(df, 2, 3)
        .select("v", "peel_round").as[(Long, Long)].collect().toMap
      got shouldBe brutePeel(es, 2, 3).map { case (v, p) => v -> p.toLong }
    }
  }

  "GraphOps.triangles" should "match brute-force triangle counts and clustering coefficients" in {
    val sparkS = spark
    import sparkS.implicits._
    (1 to 4).foreach { _ =>
      val es = randomEdges(30, 60)
      val und = es.filter(e => e._1 < e._2).toSet
      val adj = es.groupBy(_._1).map { case (v, e2) => v -> e2.map(_._2).toSet }
      val triCnt = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for {
        (a, b) <- und
        c <- adj(b) if b < c && und.contains((a, c))
      } { triCnt(a) += 1; triCnt(b) += 1; triCnt(c) += 1 }
      val want = adj.map { case (v, ns) =>
        val d = ns.size.toLong
        val t = triCnt(v)
        val cc = if (d < 2) 0L else (2 * t * 1000000L) / (d * (d - 1))
        v -> ((d, t, cc))
      }
      val got = ops.GraphOps.triangles(es.toDF("a", "b"))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      got shouldBe want
    }
  }

  it should "count a clique's triangles exactly and give its members cc = 1" in {
    val sparkS = spark
    import sparkS.implicits._
    // K4 on 0..3 (4 triangles, each node in 3) plus a pendant 4-0
    val k4 = (for { a <- 0L to 3L; b <- 0L to 3L if a != b } yield (a, b))
    val es = k4 ++ Seq((4L, 0L), (0L, 4L))
    val got = ops.GraphOps.triangles(es.toDF("a", "b"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    (1L to 3L).foreach(v => got(v) shouldBe ((3L, 3L, 1000000L)))
    got(0L) shouldBe ((4L, 3L, 500000L)) // pendant dilutes: 6/(4·3)
    got(4L) shouldBe ((1L, 0L, 0L))
  }

  "GraphOps.hashWalks" should "match brute-force hash-argmin walks on random graphs" in {
    val sparkS = spark
    import sparkS.implicits._
    val m = ops.GraphOps.WalkMod
    (1 to 4).foreach { _ =>
      val es = randomEdges(30, 45)
      val adj = es.groupBy(_._1).map { case (v, e2) => v -> e2.map(_._2).sorted }
      val steps = 3
      val want = adj.keys.flatMap { w0 =>
        var cur = w0
        (0 to steps).map { s =>
          if (s > 0)
            cur = adj(cur).minBy(b => ((w0 % m) * 1000003L + s * 31L + (b % m) * 7919L, b))
          (w0, s.toLong, cur)
        }
      }.toSet
      val got = ops.GraphOps.hashWalks(es.toDF("a", "b"), steps)
        .as[(Long, Long, Long)].collect().toSet
      got shouldBe want
    }
  }

  it should "visit a neighbor of the previous node at every step" in {
    val sparkS = spark
    import sparkS.implicits._
    val es = randomEdges(25, 35)
    val nbr = es.groupBy(_._1).map { case (v, e2) => v -> e2.map(_._2).toSet }
    val walks = ops.GraphOps.hashWalks(es.toDF("a", "b"), 3)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).values
    walks.foreach { w =>
      val path = w.sortBy(_._2).map(_._3)
      path.sliding(2).foreach { p =>
        if (p.length == 2) nbr(p(0)) should contain(p(1))
      }
    }
  }

  it should "peel a path inward one round at a time and keep a cycle forever" in {
    val sparkS = spark
    import sparkS.implicits._
    // path 0-1-2-3-4-5 plus a triangle 10-11-12: endpoints peel round 1,
    // next-in round 2, etc.; the triangle is the 2-core and never peels
    val path = (0L to 4L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val tri = Seq((10L, 11L), (11L, 10L), (11L, 12L), (12L, 11L), (12L, 10L), (10L, 12L))
    val got = ops.GraphOps.corePeel((path ++ tri).toDF("a", "b"), 2, 3)
      .select("v", "peel_round", "in_core").as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    got(0L) shouldBe ((1L, false))
    got(5L) shouldBe ((1L, false))
    got(1L) shouldBe ((2L, false))
    got(4L) shouldBe ((2L, false))
    got(2L) shouldBe ((3L, false))
    got(3L) shouldBe ((3L, false))
    Seq(10L, 11L, 12L).foreach(v => got(v) shouldBe ((0L, true)))
  }
}
