package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** Single-thread engine throughput: the deterministic run must process
  * events at the order of magnitude the reference engine publishes for
  * DSFA recognition (single-core ~100k-1M events/s depending on pattern,
  * Wayeb VLDBJ'22 — BASELINE.md §6). This guards the per-event hot path
  * (symbol lookup + delta step) against accidental allocation/boxing
  * regressions; per-executor-core throughput is what the 1000-core scale
  * story multiplies.
  *
  * The guarded quantity is what the CODE can sustain, but wall-clock on
  * this shared box swings up to 40× under neighbor steal (identical bits
  * measured 76k-3.2M ev/s back-to-back on the DSRA stream, population and
  * evictions byte-identical). Each guard therefore times `Attempts`
  * independent passes and asserts the BEST, and the floors sit an order
  * of magnitude below quiet-machine rates — they exist to catch
  * accidental O(n) blowups and boxing regressions in the per-event hot
  * path, not to benchmark (Bench.scala does that), and a real regression
  * of that kind degrades every attempt by 10×+.
  */
class ThroughputSpec extends AnyFlatSpec with Matchers {

  private val Attempts = 5

  private val rnd = new Random(1)

  private def mkEvents(n: Int): Array[CEvent] = {
    val types = Array("a", "b", "c", "d")
    Array.tabulate(n) { i =>
      CEvent(i.toLong, types(rnd.nextInt(4)), i.toLong, "",
        Map("value" -> rnd.nextInt(200).toDouble), Map.empty)
    }
  }

  /** Best rate over [[Attempts]] timed passes; `measure` must build a
    * fresh run per call and return (events/sec, outputs).
    */
  private def bestRate(measure: () => (Double, Long)): (Double, Long) = {
    var best = (0.0, 0L)
    var i = 0
    while (i < Attempts) {
      val r = measure()
      if (r._1 > best._1) best = r
      i += 1
    }
    best
  }

  it should "sustain >100k events/s single-thread on the deterministic runtime" in {
    val cp = Compiler.compile(
      ";(IsEventTypePredicate(a),+(IsEventTypePredicate(b),IsEventTypePredicate(c)),GTPredicate(value,100.0))")
    val events = mkEvents(1000000)
    // warm-up for JIT
    val warm = new DetRun(cp, "")
    var w = 0
    while (w < 200000) { warm.step(events(w)); w += 1 }

    val (rate, detections) = bestRate { () =>
      val run = new DetRun(cp, "")
      var detections = 0L
      val t0 = System.nanoTime()
      var i = 0
      while (i < events.length) {
        if (run.step(events(i)).isDefined) detections += 1
        i += 1
      }
      val secs = (System.nanoTime() - t0) / 1e9
      (events.length / secs, detections)
    }
    info(f"deterministic runtime: ${rate / 1e6}%.2f M events/s ($detections detections)")
    detections should be > 0L
    rate should be > 100000.0
  }

  it should "sustain the SPST forecasting runtime at >50k events/s" in {
    val cp = Compiler.compile("#(;(IsEventTypePredicate(a),IsEventTypePredicate(b)))")
    val events = mkEvents(300000)
    val spst = adapt.InMemory.train(events.take(50000).toSeq, cp, order = 2,
      pMin = 0.001, gammaMin = 0.001)
    val table = spst.forecastTable(ForecastMethod.ClassifyNextK, 0.4, 10, 20)
    val warm = new SpstRun(cp, spst, table, "")
    var w = 0
    while (w < 50000) { warm.step(events(w)); w += 1 }

    val (rate, forecasts) = bestRate { () =>
      val run = new SpstRun(cp, spst, table, "")
      var forecasts = 0L
      val t0 = System.nanoTime()
      var i = 0
      while (i < events.length) {
        if (run.step(events(i))._2.isDefined) forecasts += 1
        i += 1
      }
      val secs = (System.nanoTime() - t0) / 1e9
      (events.length / secs, forecasts)
    }
    info(f"SPST forecasting runtime: ${rate / 1e6}%.2f M events/s ($forecasts forecasts)")
    forecasts should be > 0L
    rate should be > 50000.0
  }

  it should "sustain the match-enumeration runtime at >100k events/s on a windowed pattern" in {
    // high-overlap windowed skip-till-any — the thread-heavy shape; the
    // per-event guard memo keeps distinct-guard evaluation off the
    // thread-count axis (measured ~1.4M ev/s; headroom for slow CI)
    val cp = Compiler.compile(
      "#(;(IsEventTypePredicate(a),IsEventTypePredicate(b))){window:10}{windowType:count}")
    val events = mkEvents(200000)
    val warm = new MatchRun(cp, "")
    var w = 0
    while (w < 40000) { warm.step(events(w)); w += 1 }

    val (rate, matches) = bestRate { () =>
      val run = new MatchRun(cp, "")
      var matches = 0L
      val t0 = System.nanoTime()
      var i = 0
      while (i < events.length) { matches += run.step(events(i)).size; i += 1 }
      val secs = (System.nanoTime() - t0) / 1e9
      (events.length / secs, matches)
    }
    info(f"match enumeration: ${rate / 1e6}%.2f M events/s ($matches matches)")
    matches should be > 0L
    rate should be > 100000.0
  }

  it should "sustain the DSRA register runtime at >100k events/s" in {
    // one projection-keyed config set advanced per event: the
    // deterministic register path must stay in the usable range (the
    // enumeration runtime is the throughput ceiling; DSRA trades constant
    // work per event for boundedness under overlap)
    val cp = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,120.0)["x"],GTAttrPredicate(value,"x"))){window:10}{windowType:count}""")
    val events = mkEvents(120000)
    val warm = new DsraRun(cp, "")
    var w = 0
    while (w < 20000) { warm.step(events(w)); w += 1 }

    val (rate, detections) = bestRate { () =>
      val run = new DsraRun(cp, "")
      var detections = 0L
      val t0 = System.nanoTime()
      var i = 0
      while (i < events.length) {
        if (run.step(events(i)).isDefined) detections += 1
        i += 1
      }
      val secs = (System.nanoTime() - t0) / 1e9
      (events.length / secs, detections)
    }
    info(f"DSRA runtime: ${rate / 1e3}%.0f k events/s ($detections detections)")
    detections should be > 0L
    // measured ~1.8-3.2M ev/s quiet on this stream after the
    // compiled-guard + projection-keyed-config + per-config-anchor pass
    // (no staggered copies); floor sized for 10×+ neighbor steal
    rate should be > 100000.0
  }

  it should "meet the pooled engine's single-run throughput with the mono-run loop" in {
    // the reference's ERFOptEngine exists to beat its registry path in
    // the single-pattern, no-partition regime (ERFOptEngine.scala:91);
    // our pooled MatchRun already runs registry-free per key, so the
    // mono-run's edge is per-state transition sharing. Parity gate
    // (VERDICT r9 item 7): mono ≥ 0.7× pooled best-of-Attempts on the
    // identical stream (expected ≥1×; the margin absorbs attempt-level
    // neighbor steal) AND above the family's absolute 100k floor.
    val cp = Compiler.compile(
      "#(;(IsEventTypePredicate(a),IsEventTypePredicate(b))){window:10}{windowType:count}")
    val events = mkEvents(200000)
    val warmP = new MatchRun(cp, "")
    val warmM = new MonoRun(cp)
    var w = 0
    while (w < 40000) { warmP.step(events(w)); warmM.step(events(w)); w += 1 }

    def measure(stepAll: () => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val outs = stepAll()
      (events.length / ((System.nanoTime() - t0) / 1e9), outs)
    }
    var bestPooled = (0.0, 0L)
    var bestMono = (0.0, 0L)
    // up to two attempt ROUNDS: the r16 full-suite run saw a host stall
    // swallow all five mono attempts at once (0.09 M ev/s in-suite vs
    // 1.4 M solo minutes later) — if the floor would fail, re-measure
    // once before failing. A real order-of-magnitude regression still
    // fails both rounds.
    var round = 0
    while (round < 2 && !(bestMono._1 > 100000.0 && bestMono._1 > bestPooled._1 * 0.7)) {
      round += 1
      for (_ <- 1 to Attempts) {
        val p = measure { () =>
          val run = new MatchRun(cp, ""); var m = 0L
          var i = 0; while (i < events.length) { m += run.step(events(i)).size; i += 1 }; m
        }
        val mo = measure { () =>
          val run = new MonoRun(cp); var m = 0L
          var i = 0; while (i < events.length) { m += run.step(events(i)).size; i += 1 }; m
        }
        if (p._1 > bestPooled._1) bestPooled = p
        if (mo._1 > bestMono._1) bestMono = mo
      }
    }
    // r16 ADVICE (low): a pass that needed round 2 must stay visible in
    // the test output, or a regression that passes one round in two
    // merges green with no trace
    if (round > 1) info("floor rescued by retry round")
    info(f"mono-run ${bestMono._1 / 1e6}%.2f M ev/s vs pooled ${bestPooled._1 / 1e6}%.2f M ev/s " +
      s"(${bestMono._2} matches each)")
    bestMono._2 shouldBe bestPooled._2
    bestMono._2 should be > 0L
    bestMono._1 should be > 100000.0
    bestMono._1 should be > bestPooled._1 * 0.7
  }

  it should "not cliff at the configuration cap under sustained adversarial load" in {
    // adversarial read domain: every event carries a fresh value, so every
    // taken configuration is projection-distinct and the population pins
    // at the cap for the whole stream. Eviction trims to the low-water
    // mark (90% of cap), so the O(n log n) sort amortizes over cap/10
    // insertions instead of firing per event — the guarded regression is
    // eviction cost, so the floor is RELATIVE: the pinned-at-cap run must
    // stay within 3× of an uncapped run over the same stream (whose
    // population ≈ the 2000-event window, i.e. MORE configs advanced per
    // event — both runs share each attempt's machine weather)
    val cp = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,0.0)["x"],EQAttrPredicate(value,"x"))){window:2000}{windowType:count}""")
    val events = Array.tabulate(20000) { i =>
      CEvent(i.toLong, "v", i.toLong, "", Map("value" -> i.toDouble), Map.empty)
    }
    def pass(cap: Int): Double = {
      val run = new DsraRun(cp, "", maxConfigs = cap)
      val t0 = System.nanoTime()
      var i = 0
      while (i < events.length) { run.step(events(i)); i += 1 }
      events.length / ((System.nanoTime() - t0) / 1e9)
    }
    pass(1600); pass(1000000) // JIT warm-up for both shapes
    var bestCapped = 0.0
    var bestFree = 0.0
    for (_ <- 1 to Attempts) {
      bestCapped = math.max(bestCapped, pass(1600))
      bestFree = math.max(bestFree, pass(1000000))
    }
    // sanity: the cap really was pinned (eviction fired throughout)
    val probe = new DsraRun(cp, "", maxConfigs = 1600)
    events.foreach(probe.step)
    probe.evictedConfigs should be > 0L
    info(f"DSRA at-cap: ${bestCapped / 1e3}%.0f k ev/s vs uncapped ${bestFree / 1e3}%.0f k ev/s")
    bestCapped should be > bestFree / 3
  }
}
