package graft

import graft.ops.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** The two connected-components engines behind near-dup grouping must
  * agree on the (unique) min-label fixpoint — including on the
  * adversarial shape each is weakest at: a long path graph (maximum
  * diameter per edge) and a random graph with singletons.
  */
class DedupCcSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]").appName("dedup-cc-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def labelsOf(
      algo: String, n: Int, edges: Seq[(Long, Long)], maxIters: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val vertices = (1L to n.toLong).toDF("doc_id")
    val pairs = edges.toDF("id_a", "id_b")
    DedupOps.neardupGroups(vertices, "doc_id", pairs, "id_a", "id_b", maxIters, algo)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  "large-star/small-star CC" should "collapse a 10k-node path graph in bounded rounds, agreeing with pointer jumping" in {
    val n = 10000
    val path = (1L until n.toLong).map(i => (i, i + 1))
    // star CC: diameter 9999, rounds bounded well below the O(log² n)
    // worst case — the maxIters cap IS the bound assertion (require
    // fails the test if exceeded)
    val star = labelsOf("star", n, path, maxIters = 25)
    star.size shouldBe n
    all(star.values) shouldBe 1L
    // pointer jumping on the same graph: O(log d) rounds
    val pointer = labelsOf("pointer", n, path, maxIters = 20)
    star shouldBe pointer
  }

  it should "agree with pointer jumping on a random graph with singletons" in {
    val rnd = new scala.util.Random(42)
    val n = 500
    // ~300 random edges over the first 400 ids; ids 401-500 stay
    // singletons; self-pairs and duplicates included deliberately
    val edges = Seq.fill(300)((rnd.nextInt(400) + 1L, rnd.nextInt(400) + 1L))
    val star = labelsOf("star", n, edges, maxIters = 25)
    val pointer = labelsOf("pointer", n, edges, maxIters = 20)
    star shouldBe pointer
    // singletons label themselves
    (401L to 500L).foreach(id => star(id) shouldBe id)
  }

  it should "handle an empty pair set (all singletons)" in {
    val star = labelsOf("star", 5, Seq.empty, maxIters = 5)
    star shouldBe (1L to 5L).map(i => i -> i).toMap
  }

  "driver-side union-find CC" should "agree with pointer jumping on random graphs and paths" in {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 400
      val edges = Seq.fill(250)((rnd.nextInt(300) + 1L, rnd.nextInt(300) + 1L))
      labelsOf("local", n, edges, maxIters = 5) shouldBe labelsOf("pointer", n, edges, maxIters = 20)
    }
    val path = (1L until 2000L).map(i => (i, i + 1))
    val local = labelsOf("local", 2000, path, maxIters = 5)
    local.size shouldBe 2000
    all(local.values) shouldBe 1L
  }

  it should "be what auto selects under the edge bound, with identical labels" in {
    val rnd = new scala.util.Random(9)
    val edges = Seq.fill(120)((rnd.nextInt(150) + 1L, rnd.nextInt(150) + 1L))
    labelsOf("auto", 200, edges, maxIters = 20) shouldBe labelsOf("pointer", 200, edges, maxIters = 20)
  }

  it should "handle empty pairs and null-free self-pairs" in {
    labelsOf("local", 4, Seq.empty, maxIters = 5) shouldBe (1L to 4L).map(i => i -> i).toMap
    labelsOf("local", 4, Seq((2L, 2L), (3L, 4L)), maxIters = 5) shouldBe
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L)
  }

  it should "group string ids with lexicographic min labels" in {
    val s = spark
    import s.implicits._
    val vertices = Seq("alpha", "beta", "gamma", "delta").toDF("doc_id")
    val pairs = Seq(("beta", "gamma"), ("gamma", "alpha")).toDF("id_a", "id_b")
    val out = DedupOps.neardupGroups(vertices, "doc_id", pairs, "id_a", "id_b", 5, "local")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    out shouldBe Map(
      "alpha" -> "alpha", "beta" -> "alpha", "gamma" -> "alpha", "delta" -> "delta")
  }

  it should "fall back to the distributed path when auto exceeds the edge bound" in {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(21)
    val vertices = (1L to 120L).toDF("doc_id")
    val edges = Seq.fill(80)((rnd.nextInt(100) + 1L, rnd.nextInt(100) + 1L))
    val pairs = edges.toDF("id_a", "id_b")
    // bound of 10 < 80 edges forces pointer jumping under algo=auto
    val auto = DedupOps.neardupGroups(vertices, "doc_id", pairs, "id_a", "id_b",
        maxIters = 20, algo = "auto", localMaxEdges = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pointer = DedupOps.neardupGroups(vertices, "doc_id", pairs, "id_a", "id_b",
        maxIters = 20, algo = "pointer")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    auto shouldBe pointer
  }
}
