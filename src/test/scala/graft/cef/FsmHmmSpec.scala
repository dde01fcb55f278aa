package graft.cef

import graft.cef.spark.Train
import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll
import scala.util.Random

/** T6: the supervised FSM-state HMM estimator — the distributed count
  * aggregation must agree exactly with a sequential replay of the same
  * finals-based learning rule (reference estimator/HMMEstimator/
  * FSMStateEstimator.scala), and the fitted model must behave like a
  * probability model.
  */
class FsmHmmSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("fsmhmm-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cp = Compiler.compile(
    ";(IsEventTypePredicate(a),IsEventTypePredicate(b))")

  private def mkEvents(n: Int, keys: Int, seed: Long): Seq[CEvent] = {
    val rnd = new Random(seed)
    val types = Array("a", "b", "c")
    (1 to n).map(i =>
      CEvent(i.toLong, types(rnd.nextInt(3)), i.toLong, s"k${rnd.nextInt(keys)}",
        Map.empty, Map.empty))
  }

  /** Sequential reference fit: same finals-based windows, same MLE. */
  private def sequentialFit(events: Seq[CEvent]): FsmHmm = {
    val sdfa = cp.sdfa
    val nSyms = sdfa.iso.size
    val nSt = sdfa.nStates
    val depth = sdfa.shortestPathToFinal.filter(_ >= 0).max + 1
    val pi = new Array[Double](nSyms)
    val a = Array.fill(nSyms)(new Array[Double](nSyms))
    val b = Array.fill(nSyms)(new Array[Double](nSt))
    events.groupBy(_.partition).foreach { case (_, evs) =>
      var state = sdfa.start
      var win = Vector.empty[(Int, Int)]
      evs.sortBy(e => (e.timestamp, e.id)).foreach { e =>
        val sym = sdfa.iso.evaluate(e)
        if (sym >= 0) {
          state = sdfa.delta(state)(sym)
          win = (win :+ (sym, state)).takeRight(depth)
          if (sdfa.isFinal(state)) {
            pi(win.head._1) += 1
            win.indices.foreach { i =>
              b(win(i)._1)(win(i)._2) += 1
              if (i > 0) a(win(i - 1)._1)(win(i)._1) += 1
            }
          }
        }
      }
    }
    def norm(rows: Array[Array[Double]]): Array[Array[Double]] = rows.map { r =>
      val s = r.sum
      if (s > 0) r.map(_ / s) else r.map(_ => 1.0 / r.length)
    }
    val piSum = pi.sum
    FsmHmm(Hmm(if (piSum > 0) pi.map(_ / piSum) else pi.map(_ => 1.0 / nSyms),
      norm(a), norm(b)), depth, nSt)
  }

  "the FSM-state HMM estimator" should "match a sequential replay exactly" in {
    import spark.implicits._
    val events = mkEvents(600, keys = 5, seed = 11)
    val fitted = Train.learnFsmHmm(events.toDS(), cp)
    val expect = sequentialFit(events)

    fitted.depth shouldBe expect.depth
    fitted.nFsmStates shouldBe cp.sdfa.nStates
    fitted.hmm.pi.zip(expect.hmm.pi).foreach { case (x, y) => x shouldBe y +- 1e-12 }
    fitted.hmm.a.flatten[Double].zip(expect.hmm.a.flatten[Double])
      .foreach { case (x, y) => x shouldBe y +- 1e-12 }
    fitted.hmm.b.flatten[Double].zip(expect.hmm.b.flatten[Double])
      .foreach { case (x, y) => x shouldBe y +- 1e-12 }
  }

  it should "produce a proper probability model that prefers observed windows" in {
    import spark.implicits._
    val events = mkEvents(600, keys = 3, seed = 13)
    val m = Train.learnFsmHmm(events.toDS(), cp)
    m.hmm.pi.sum shouldBe 1.0 +- 1e-9
    m.hmm.a.foreach(_.sum shouldBe 1.0 +- 1e-9)
    m.hmm.b.foreach(_.sum shouldBe 1.0 +- 1e-9)
    // a genuine training window (state walk ending at a final) has every
    // step's probability in the model by construction — its likelihood
    // must be free of zero-probability steps (log(MinPositiveValue) ≈ -744
    // per step marks an impossible observation)
    val sdfa = cp.sdfa
    var st = sdfa.start
    var win = Vector.empty[Int]
    var sample: Option[Vector[Int]] = None
    events.filter(_.partition == "k0").sortBy(e => (e.timestamp, e.id)).foreach { e =>
      val s = sdfa.iso.evaluate(e)
      if (s >= 0) {
        st = sdfa.delta(st)(s)
        win = (win :+ st).takeRight(m.depth)
        if (sdfa.isFinal(st) && sample.isEmpty && win.size == m.depth) sample = Some(win)
      }
    }
    sample should not be empty
    m.stateWindowLogLikelihood(sample.get) should be > -300.0
    m.symbolBelief(sample.get).sum shouldBe 1.0 +- 1e-9
  }
}
