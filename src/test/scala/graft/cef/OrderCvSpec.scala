package graft.cef

import graft.cef.spark.Train
import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll
import scala.util.Random

/** T6 order selection: the distributed held-out cross-validation
  * ([[Train.orderCv]]) must agree with the in-memory estimator
  * ([[OrderEstimator]]) whenever their splits coincide (single key), and
  * with a sequential per-key replay of its own split rule in general.
  */
class OrderCvSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("ordercv-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cp = Compiler.compile(
    ";(IsEventTypePredicate(a),IsEventTypePredicate(b))")

  private def mkEvents(n: Int, keys: Int, seed: Long, skew: Double = 0.0): Seq[CEvent] = {
    val rnd = new Random(seed)
    val types = Array("a", "b", "c")
    (1 to n).map { i =>
      // optional bias so some orders genuinely beat others
      val t =
        if (rnd.nextDouble() < skew && i > 1) types((i % 3 + 1) % 3)
        else types(rnd.nextInt(3))
      CEvent(i.toLong, t, i.toLong, s"k${rnd.nextInt(keys)}", Map.empty, Map.empty)
    }
  }

  /** Sequential replay of orderCv's split rule: per-key prefix cut at
    * floor(0.8 n), one CST from the train windows, per-order PST + loss
    * over the test symbols with contexts sliding across the boundary.
    */
  private def sequentialCv(events: Seq[CEvent], maxOrder: Int): Seq[(Int, Int, Double)] = {
    val iso = cp.iso
    val byKey = events.groupBy(_.partition).view.mapValues(
      _.sortBy(e => (e.timestamp, e.id)).map(iso.evaluate).filter(_ >= 0))
    val cst = new Cst
    var test = List.empty[(Int, List[Int])] // (symbol, context most-recent-first)
    byKey.foreach { case (_, syms) =>
      val cut = math.floor(syms.size * 0.8).toInt
      val buf = new SymbolBuffer(maxOrder + 1)
      syms.zipWithIndex.foreach { case (s, i) =>
        buf.push(s)
        if (i < cut) cst.add(buf.pop)
        else test ::= (s, buf.pop.tail)
      }
    }
    val nTest = test.size
    (0 to maxOrder).map { m =>
      val pst = PstLearner.learn(cst, m, 0.001, 0.05, 0.001, 1.05)
      val ll = test.foldLeft(0.0) { case (acc, (s, ctx)) =>
        acc + -math.log(math.max(pst.condProbFor(s, ctx.take(m)), 1e-12))
      }
      (m, pst.leaves.size, ll / nTest)
    }
  }

  it should "match the in-memory OrderEstimator on a single-key stream" in {
    val sparkS = spark
    import sparkS.implicits._
    val events = mkEvents(3000, keys = 1, seed = 7, skew = 0.5)
    val dist = Train.orderCv(events.toDS(), cp, maxOrder = 2)

    val syms = events.sortBy(e => (e.timestamp, e.id)).map(cp.iso.evaluate).filter(_ >= 0)
    val (bestMem, lossesMem) = OrderEstimator.selectOrder(syms, maxOrder = 2)

    dist.foreach { case (m, _, loss) =>
      loss shouldBe lossesMem(m) +- 1e-9
    }
    val bestDist = dist.minBy { case (m, _, loss) => (loss, m) }._1
    bestDist shouldBe bestMem
  }

  it should "match a sequential per-key replay on multi-key streams" in {
    val sparkS = spark
    import sparkS.implicits._
    for (seed <- 1 to 5) {
      val events = mkEvents(2000, keys = 7, seed = seed, skew = 0.4)
      val dist = Train.orderCv(events.toDS(), cp, maxOrder = 2)
      val seq = sequentialCv(events, maxOrder = 2)
      dist.map(_._1) shouldBe seq.map(_._1)
      dist.map(_._2) shouldBe seq.map(_._2) // identical learned tree shapes
      dist.zip(seq).foreach { case ((_, _, dl), (_, _, sl)) =>
        dl shouldBe sl +- 1e-9
      }
    }
  }

  it should "prefer higher order on an order-2 source and order 0 on iid noise" in {
    val sparkS = spark
    import sparkS.implicits._
    // iid uniform: more context cannot help on held-out data, and the
    // losses collapse to near-identical values — selection must still be
    // deterministic (smallest order wins ties after quantization)
    val iid = mkEvents(4000, keys = 3, seed = 11)
    val distIid = Train.orderCv(iid.toDS(), cp, maxOrder = 2)
    val bestIid = distIid.minBy { case (m, _, loss) => (loss, m) }._1
    // a strongly order-1 source: next type determined by previous type
    val rnd = new Random(13)
    val types = Array("a", "b", "c")
    var prev = 0
    val markov = (1 to 4000).map { i =>
      val nxt = if (rnd.nextDouble() < 0.9) (prev + 1) % 3 else rnd.nextInt(3)
      prev = nxt
      CEvent(i.toLong, types(nxt), i.toLong, s"k${i % 2}", Map.empty, Map.empty)
    }
    val distM = Train.orderCv(markov.toDS(), cp, maxOrder = 2)
    val bestM = distM.minBy { case (m, _, loss) => (loss, m) }._1
    bestM should be >= 1
    distM(bestM)._3 should be < distM(0)._3
    withClue(s"iid losses ${distIid.map(_._3)}") {
      distIid(bestIid)._3 should be <= distIid(2)._3
    }
  }
}
