package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random

class ProfilerSpec extends AnyFlatSpec with Matchers {

  private val rnd = new Random(99)

  "MCC" should "match the naive formula where it does not overflow" in {
    for (_ <- 1 to 500) {
      val s = ClassStats(rnd.nextInt(50), rnd.nextInt(50), rnd.nextInt(50), rnd.nextInt(50))
      val denom = math.sqrt(
        (s.tp + s.fp).toDouble * (s.tp + s.fn) * (s.tn + s.fp) * (s.tn + s.fn))
      if (denom != 0) {
        val naive = ((s.tp * s.tn).toDouble - (s.fp * s.fn)) / denom
        s.mcc shouldBe naive +- 1e-9
      } else s.mcc shouldBe 0.0
    }
  }

  it should "not overflow on huge counts (the reason for the product-of-ratios form)" in {
    val s = ClassStats(3000000000L, 3000000000L, 1000000L, 1000000L)
    s.mcc shouldBe 0.999 +- 1e-3
    s.mcc should not be Double.NaN
  }

  "undefined ratios" should "be -1 like the reference (ClassificationStatsEstimator:52-85)" in {
    ClassStats(0, 5, 0, 0).precision shouldBe -1
    ClassStats(0, 5, 0, 0).recall shouldBe -1
    ClassStats(0, 0, 0, 0).accuracy shouldBe -1
    ClassStats(5, 0, 0, 0).npv shouldBe -1
    ClassStats(0, 5, 0, 0).f1 shouldBe -1
  }

  "forecast evaluation" should "classify tp/tn/fp/fn per the reference's interval rule" in {
    val detections = Seq(10L, 20L)
    Profiler.evaluate(positive = true, 8, 12, detections) shouldBe ClassStats(1, 0, 0, 0)
    Profiler.evaluate(positive = true, 11, 15, detections) shouldBe ClassStats(0, 0, 1, 0)
    Profiler.evaluate(positive = false, 11, 15, detections) shouldBe ClassStats(0, 1, 0, 0)
    Profiler.evaluate(positive = false, 18, 25, detections) shouldBe ClassStats(0, 0, 0, 1)
    // boundary inclusive on both ends
    Profiler.evaluate(positive = true, 20, 20, detections) shouldBe ClassStats(1, 0, 0, 0)
  }

  "perfect classification" should "give MCC 1" in {
    ClassStats(10, 10, 0, 0).mcc shouldBe 1.0 +- 1e-12
    ClassStats(0, 0, 10, 10).mcc shouldBe -1.0 +- 1e-12
  }

  "the regression collector" should "track per-state interval hits and midpoint error (A3)" in {
    val rc = new RegressionCollector
    rc.add(state = 3, start = 2, end = 6, middle = 4.0, actualDistance = 5)  // hit, |5-4|=1
    rc.add(state = 3, start = 2, end = 6, middle = 4.0, actualDistance = 8)  // miss, |8-4|=4
    rc.add(state = 3, start = 1, end = 3, middle = 2.0, actualDistance = -1) // never detected
    rc.add(state = 7, start = 1, end = 2, middle = 1.5, actualDistance = 2)  // hit, 0.5

    val s3 = rc.stats(3)
    s3.n shouldBe 3
    s3.observed shouldBe 2
    s3.hits shouldBe 1
    s3.hitRate shouldBe 0.5 +- 1e-12
    s3.avgSpread shouldBe (4 + 4 + 2) / 3.0 +- 1e-12
    s3.meanAbsError shouldBe 2.5 +- 1e-12

    val t = rc.totals
    t.n shouldBe 4
    t.hits shouldBe 2
    t.hitRate shouldBe 2.0 / 3 +- 1e-12
    // empty collector conventions
    RegressionStats().hitRate shouldBe -1
    RegressionStats().meanAbsError shouldBe -1
  }
}
