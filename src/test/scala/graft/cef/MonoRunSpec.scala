package graft.cef

import graft.cef.spark.Detect
import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** MonoRun ≡ pooled MatchRun (VERDICT r9 item 7): the registry-free
  * single-run loop (reference engine/ERFOptEngine.scala:91-287) must
  * enumerate EXACTLY the pooled engine's matches on the same stream —
  * fuzzed across pattern shapes (strict/skip-till-any, count/time
  * windows, choice, iteration) and random streams. Plus the Spark plan
  * contract: `Detect.matchesMono` must not shuffle.
  */
class MonoRunSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("monorun-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val patterns = Seq(
    ";(IsEventTypePredicate(a),IsEventTypePredicate(b))",
    ";(IsEventTypePredicate(a),+(IsEventTypePredicate(b),IsEventTypePredicate(c)),GTPredicate(value,100.0))",
    "#(;(IsEventTypePredicate(a),IsEventTypePredicate(b))){window:8}{windowType:count}",
    "#(;(IsEventTypePredicate(a),IsEventTypePredicate(b),IsEventTypePredicate(c))){window:120}{windowType:time}",
    "#(;(IsEventTypePredicate(a),*(IsEventTypePredicate(b)),IsEventTypePredicate(c))){window:6}{windowType:count}")

  private def mkEvents(seed: Int, n: Int): Seq[CEvent] = {
    val rnd = new scala.util.Random(seed)
    val types = Vector("a", "b", "c", "d")
    (1 to n).map { i =>
      CEvent(i.toLong, types(rnd.nextInt(4)), i.toLong * 10, "",
        Map("value" -> rnd.nextInt(200).toDouble), Map.empty)
    }
  }

  it should "enumerate exactly the pooled engine's matches across pattern shapes" in {
    var totalMatches = 0
    for (p <- patterns; seed <- Seq(3, 7, 11)) {
      val cp = Compiler.compile(p)
      MonoRun.eligible(cp) shouldBe true
      val events = mkEvents(seed, 400)
      val pooled = new MatchRun(cp, "")
      val mono = new MonoRun(cp)
      // step-by-step: every event's emitted matches must agree, not just
      // the final accumulation (catches off-by-one-batch divergence)
      events.foreach { e =>
        val pm = pooled.step(e).toSet
        val mm = mono.step(e).toSet
        withClue(s"pattern $p seed $seed event ${e.id}: ") { mm shouldBe pm }
      }
      pooled.activeThreads shouldBe mono.activeThreads
      totalMatches += {
        val pooled2 = new MatchRun(cp, "")
        events.flatMap(pooled2.step).size
      }
    }
    totalMatches should be > 100 // the fuzz actually exercised matches
  }

  it should "handle reset events and resetOnMatch like the reference's reset flag" in {
    val cp = Compiler.compile(
      "#(;(IsEventTypePredicate(a),IsEventTypePredicate(b))){window:8}{windowType:count}")
    val events = mkEvents(19, 200)
    // reset event mid-stream clears state in both engines
    val resetAt = 100L
    val withReset = events.map(e => if (e.id == resetAt) e.copy(eventType = CEvent.ResetType) else e)
    val pooled = new MatchRun(cp, "")
    val mono = new MonoRun(cp)
    withReset.foreach { e => mono.step(e).toSet shouldBe pooled.step(e).toSet }

    // resetOnMatch: after any event that completes a match, the run pool
    // collapses to empty (the reference resets runs to their start state,
    // which in the flat-list representation is the implicit fresh seed)
    val rm = new MonoRun(cp, resetOnMatch = true)
    var sawMatch = false
    events.foreach { e =>
      if (rm.step(e).nonEmpty) { sawMatch = true; rm.activeThreads shouldBe 0 }
    }
    sawMatch shouldBe true
  }

  it should "reject register patterns (the pooled engine's regime)" in {
    val cpR = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,120.0)["x"],GTAttrPredicate(value,"x"))){window:10}{windowType:count}""")
    MonoRun.eligible(cpR) shouldBe false
    an[IllegalArgumentException] should be thrownBy new MonoRun(cpR)
  }

  it should "run shuffle-free in Spark and agree with the pooled path" in {
    val sparkS = spark
    import sparkS.implicits._
    val events = mkEvents(23, 500)
    val cp = Compiler.compile(
      "#(;(IsEventTypePredicate(a),IsEventTypePredicate(b))){window:8}{windowType:count}")

    val monoDs = Detect.matchesMono(events.toDS(), cp)
    // plan contract: narrowing + in-task sort only — NO exchange (the
    // pooled path's hash repartition on a constant key would funnel the
    // whole stream through one shuffle write + read)
    val plan = monoDs.queryExecution.executedPlan.toString
    plan should not include "Exchange"

    val pooledOut = Detect.matches(events.toDS(), cp).collect()
      .map(m => (m.eventIds, m.counters)).toSet
    val monoOut = monoDs.collect().map(m => (m.eventIds, m.counters)).toSet
    monoOut shouldBe pooledOut
    monoOut should not be empty

    // register pattern: same shuffle-free plan, pooled-run fallback
    val cpR = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,120.0)["x"],GTAttrPredicate(value,"x"))){window:10}{windowType:count}""")
    val evR = {
      val rnd = new scala.util.Random(29)
      (1 to 300).map { i =>
        CEvent(i.toLong, "v", i.toLong * 10, "", Map("value" -> rnd.nextInt(200).toDouble), Map.empty)
      }
    }
    val monoR = Detect.matchesMono(evR.toDS(), cpR)
    monoR.queryExecution.executedPlan.toString should not include "Exchange"
    monoR.collect().map(m => (m.eventIds, m.counters)).toSet shouldBe
      Detect.matches(evR.toDS(), cpR).collect().map(m => (m.eventIds, m.counters)).toSet
  }
}
