package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** C10 cross-runtime equivalence: on windowed SREMO patterns the
  * deterministic DSRA runtime must detect at exactly the stream positions
  * where the enumeration runtime completes ≥1 match, while its
  * configuration population stays bounded regardless of match overlap —
  * the property that makes the deterministic path scale (and forecast).
  */
class DsraSpec extends AnyFlatSpec with Matchers {

  private val rnd = new Random(7)

  private def stream(n: Int): Seq[CEvent] =
    (1 to n).map(i =>
      if (rnd.nextInt(40) == 0) CEvent.reset("k") // mid-stream resets too
      else CEvent(i.toLong, "v", i.toLong, "k", Map("value" -> rnd.nextInt(200).toDouble), Map.empty))

  private val patterns = Seq(
    """#(;(GTPredicate(value,120.0)["x"],GTAttrPredicate(value,"x"))){window:10}{windowType:count}""",
    """#(;(GTPredicate(value,100.0)["x"],EQAttrPredicate(value,"x"))){window:5}{windowType:count}""",
    """#(;(GTPredicate(value,80.0)["x"],GTAttrPredicate(value,"x"),LTAttrPredicate(value,"x"))){window:8}{windowType:count}""",
    // time windows: the runtime counter skips RESET positions while the
    // timestamps (= stream position) do not, so count and time windows
    // genuinely differ on streams with resets
    """#(;(GTPredicate(value,120.0)["x"],GTAttrPredicate(value,"x"))){window:10}{windowType:time}""",
    """#(;(GTPredicate(value,90.0)["x"],LTAttrPredicate(value,"x"))){window:6}{windowType:time}""")

  "the DSRA runtime" should "detect exactly the enumeration runtime's completion points" in {
    patterns.foreach { pt =>
      val cp = Compiler.compileMatchOnly(pt)
      val W = cp.window.toInt
      (1 to 20).foreach { _ =>
        val events = stream(60 + rnd.nextInt(60))
        val mr = new MatchRun(cp, "k")
        // runtime counters skip reset events — track the same numbering
        var pos = 0L
        val completions = events.flatMap { e =>
          val ms = mr.step(e)
          if (!e.isReset) pos += 1
          if (ms.nonEmpty) Some(pos) else None
        }.toSet

        val dr = new DsraRun(cp, "k")
        var maxCfg = 0
        val detections = events.flatMap { e =>
          val d = dr.step(e)
          maxCfg = math.max(maxCfg, dr.activeConfigs)
          d
        }
        detections.map(_.counter).toSet shouldBe completions
        // deterministic population bound: |Q| × (W+1) valuations × taken
        // flag per copy, W copies — independent of match overlap
        maxCfg should be <= 2 * cp.snfa.states.size * (W + 1) * W
      }
    }
  }

  it should "agree with the enumeration runtime on randomly generated register patterns" in {
    val ops = Vector("GTAttrPredicate", "LTAttrPredicate", "EQAttrPredicate")
    (1 to 25).foreach { _ =>
      val c = 60 + rnd.nextInt(100)
      val w = 3 + rnd.nextInt(10)
      val op = ops(rnd.nextInt(ops.size))
      val extra = // sometimes a 3-step pattern with a second register read
        if (rnd.nextBoolean()) "" else s""",${ops(rnd.nextInt(ops.size))}(value,"x")"""
      val wt = if (rnd.nextBoolean()) "count" else "time"
      // selection strategy varies too: skip-till-any (#), skip-till-next
      // (@) and strict contiguity (no prefix) — the latter two compile
      // pre-take state-advancing IGNORE transitions, the class the anchor
      // design admits (the old staggered-copies runtime had to reject it)
      val sel = Seq("#(%s)", "@(%s)", "%s")(rnd.nextInt(3))
      val body = s""";(GTPredicate(value,$c.0)["x"],$op(value,"x")$extra)"""
      val pt = sel.format(body) + s"{window:$w}{windowType:$wt}"
      val cp = Compiler.compileMatchOnly(pt)
      val events = stream(80)
      val mr = new MatchRun(cp, "k")
      var pos = 0L
      val completions = events.flatMap { e =>
        val ms = mr.step(e)
        if (!e.isReset) pos += 1
        if (ms.nonEmpty) Some(pos) else None
      }.toSet
      val dr = new DsraRun(cp, "k")
      val detections = events.flatMap(dr.step).map(_.counter).toSet
      withClue(s"pattern $pt: ") { detections shouldBe completions }
    }
  }

  it should "stay bounded under adversarial full-overlap streams" in {
    // strictly ascending high values: every in-window pair matches, so the
    // enumeration runtime's match count is ~W·n while the deterministic
    // configuration population must stay flat
    val cp = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,120.0)["x"],GTAttrPredicate(value,"x"))){window:10}{windowType:count}""")
    val events = (1 to 300).map(i =>
      CEvent(i.toLong, "v", i.toLong, "k", Map("value" -> (121.0 + i)), Map.empty))
    val dr = new DsraRun(cp, "k")
    val counts = events.map { e => dr.step(e); dr.activeConfigs }
    counts.max should be <= 2 * cp.snfa.states.size * 11 * 10
    // every event from the second on completes a match
    val dr2 = new DsraRun(cp, "k")
    events.count(e => dr2.step(e).isDefined) shouldBe 299
  }

  it should "stay bounded by in-window span on adversarial TIME-windowed streams" in {
    // time windows carry the anchor in config identity (no dominant anchor
    // under the abs() rule), so the worst-case population is proportional
    // to the events inside one window span — not to total stream length
    val cp = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,120.0)["x"],GTAttrPredicate(value,"x"))){window:40}{windowType:time}""")
    // ts advances by 4 per event ⇒ ≤ 10 events inside any window span
    val events = (1 to 400).map(i =>
      CEvent(i.toLong, "v", i.toLong * 4, "k", Map("value" -> (121.0 + i)), Map.empty))
    val dr = new DsraRun(cp, "k")
    val counts = events.map { e => dr.step(e); dr.activeConfigs }
    counts.max should be <= 2 * cp.snfa.states.size * 11
  }

  it should "cap the population on adversarial read domains, exactly equivalent below the cap" in {
    // adversarial READ DOMAIN: every event carries a fresh value, so every
    // taken configuration has a distinct projection — inside a huge window
    // the population grows linearly with the stream and no dedup helps
    val cp = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,0.0)["x"],EQAttrPredicate(value,"x"))){window:100000}{windowType:count}""")
    val events = (1 to 600).map(i =>
      CEvent(i.toLong, "v", i.toLong, "k", Map("value" -> i.toDouble), Map.empty))
    // uncapped-equivalent run (cap not reached): the population really is
    // unbounded-ish — it tracks the stream length
    val free = new DsraRun(cp, "k", maxConfigs = 1000000)
    events.foreach(free.step)
    free.activeConfigs should be >= 600
    free.evictedConfigs shouldBe 0L
    // capped run: population never exceeds the cap, evictions are counted
    val capped = new DsraRun(cp, "k", maxConfigs = 100)
    val counts = events.map { e => capped.step(e); capped.activeConfigs }
    counts.max should be <= 100
    capped.evictedConfigs should be > 0L
    // below the cap the guard must be a no-op: same detections as the
    // enumeration runtime on a stream whose population stays under it
    val small = stream(100)
    val mr = new MatchRun(cp, "k")
    var pos = 0L
    val completions = small.flatMap { e =>
      val ms = mr.step(e)
      if (!e.isReset) pos += 1
      if (ms.nonEmpty) Some(pos) else None
    }.toSet
    val dr = new DsraRun(cp, "k", maxConfigs = 2000)
    val detections = small.flatMap(dr.step).map(_.counter).toSet
    dr.evictedConfigs shouldBe 0L
    detections shouldBe completions
  }

  it should "round-trip snapshot/restore across at-cap evictions" in {
    // the batched (low-water) eviction must commute with GroupState
    // round-trips: snapshotting a capped run mid-stream and restoring
    // into a fresh run continues EXACTLY like the uninterrupted run —
    // restore's own enforceCap is a no-op on any snapshot a capped run
    // can produce (population ≤ cap by construction)
    val cp = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,0.0)["x"],EQAttrPredicate(value,"x"))){window:100000}{windowType:count}""")
    val rnd2 = new scala.util.Random(47)
    (1 to 10).foreach { _ =>
      val events = (1 to (300 + rnd2.nextInt(200))).map(i =>
        CEvent(i.toLong, "v", i.toLong, "k", Map("value" -> i.toDouble), Map.empty))
      val whole = new DsraRun(cp, "k", maxConfigs = 64)
      val straight = events.flatMap(whole.step).map(_.counter)
      val splitAt = 1 + rnd2.nextInt(events.size - 1)
      val first = new DsraRun(cp, "k", maxConfigs = 64)
      val out1 = events.take(splitAt).flatMap(first.step).map(_.counter)
      val second = new DsraRun(cp, "k", maxConfigs = 64)
      second.restore(first.snapshot)
      val out2 = events.drop(splitAt).flatMap(second.step).map(_.counter)
      (out1 ++ out2) shouldBe straight
      whole.evictedConfigs should be > 0L // the cap really was in play
    }
  }

  it should "warn once per logical run and carry the eviction counter across snapshot/restore" in {
    // the population warning's guard is the evicted counter itself, and
    // that counter is logical-run state: a streaming key that round-trips
    // through GroupState every micro-batch must warn ONCE (its first-ever
    // eviction), not once per batch (r15 VERDICT burr #2)
    val cp = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,0.0)["x"],EQAttrPredicate(value,"x"))){window:100000}{windowType:count}""")
    val events = (1 to 600).map(i =>
      CEvent(i.toLong, "v", i.toLong, "k", Map("value" -> i.toDouble), Map.empty))
    def withCapturedErr[A](body: => A): (A, String) = {
      val buf = new java.io.ByteArrayOutputStream()
      val prev = System.err
      System.setErr(new java.io.PrintStream(buf, true))
      try { val a = body; (a, buf.toString) } finally System.setErr(prev)
    }
    def warnLines(s: String): Int =
      s.linesIterator.count(_.contains("configuration population exceeded"))
    // first half: many evictions, exactly one warning line
    val ((snap, firstEvicted), err1) = withCapturedErr {
      val r = new DsraRun(cp, "k", maxConfigs = 100)
      events.take(400).foreach(r.step)
      (r.snapshot, r.evictedConfigs)
    }
    firstEvicted should be > 0L
    snap.evicted shouldBe firstEvicted // surfaced on the state payload
    warnLines(err1) shouldBe 1
    // restored continuation: counter keeps growing, warning does NOT
    // re-fire even though this incarnation evicts plenty more
    val (total, err2) = withCapturedErr {
      val r2 = new DsraRun(cp, "k", maxConfigs = 100)
      r2.restore(snap)
      events.drop(400).foreach(r2.step)
      r2.evictedConfigs
    }
    total should be > firstEvicted
    warnLines(err2) shouldBe 0
  }

  it should "reject unwindowed register patterns" in {
    val cp = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,120.0)["x"],GTAttrPredicate(value,"x")))""")
    an[IllegalArgumentException] should be thrownBy new DsraRun(cp, "k")
  }

  it should "not eagerly evaluate attributes of events no configuration reaches" in {
    // heterogeneous stream: only 'm' events carry the 'value' attribute;
    // guard evaluation must stay lazy (eager per-event attribute hoisting
    // would throw NoSuchElementException on every 'other' event)
    val cp = Compiler.compileMatchOnly(
      """#(;(^(IsEventTypePredicate(m),GTPredicate(value,120.0))["x"],^(IsEventTypePredicate(m),GTAttrPredicate(value,"x")))){window:10}{windowType:count}""")
    val events = (1 to 120).map { i =>
      if (i % 3 == 0) CEvent(i.toLong, "m", i.toLong, "k", Map("value" -> (100.0 + i)), Map.empty)
      else CEvent(i.toLong, "other", i.toLong, "k", Map.empty, Map.empty)
    }
    val mr = new MatchRun(cp, "k")
    val completions = events.flatMap { e =>
      if (mr.step(e).nonEmpty) Some(e.id) else None
    }.toSet
    val dr = new DsraRun(cp, "k")
    val detections = events.flatMap(dr.step).map(_.eventId).toSet
    detections shouldBe completions
    completions should not be empty
  }

  it should "agree with the enumeration runtime on OUT-OF-ORDER time-windowed streams" in {
    // late events: the abs(ts-anchor) rule has no dominant anchor, so
    // time-windowed configs must not max-merge across different anchors
    val cp = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,120.0)["x"],GTAttrPredicate(value,"x"))){window:30}{windowType:time}""")
    (1 to 10).foreach { _ =>
      val n = 80 + rnd.nextInt(40)
      val events = (1 to n).map { i =>
        // timestamps jitter ±25 around the arrival position — late data
        val ts = i.toLong * 5 + rnd.nextInt(51) - 25
        CEvent(i.toLong, "v", ts, "k", Map("value" -> rnd.nextInt(200).toDouble), Map.empty)
      }
      val mr = new MatchRun(cp, "k")
      var pos = 0L
      val completions = events.flatMap { e =>
        val ms = mr.step(e)
        pos += 1
        if (ms.nonEmpty) Some(pos) else None
      }.toSet
      val dr = new DsraRun(cp, "k")
      val detections = events.flatMap(dr.step).map(_.counter).toSet
      detections shouldBe completions
    }
  }

  it should "enforce the time window when the first TAKE's timestamp is -1" in {
    // a genuine event timestamp of -1 must not collide with the pre-take
    // anchor sentinel and disable the window check (found by fuzzing:
    // anchored-ness is keyed on `taken`, not the anchor value)
    val cp = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,67.0)["x"],LTAttrPredicate(value,"x"),GTAttrPredicate(value,"x"))){window:50}{windowType:time}""")
    val events = Seq(
      CEvent(1L, "u", -1L, "k", Map("value" -> 69.0), Map.empty),  // take, ts = -1
      CEvent(2L, "u", 11L, "k", Map("value" -> 41.0), Map.empty),  // 41 < 69
      CEvent(3L, "u", 49L, "k", Map("value" -> 79.0), Map.empty))  // 79 > 69, BUT abs(49-(-1)) = 50 >= 50
    val mr = new MatchRun(cp, "k")
    events.flatMap(e => mr.step(e)) shouldBe empty
    val dr = new DsraRun(cp, "k")
    events.flatMap(dr.step) shouldBe empty
  }

  it should "treat a read-only undeclared register as never bound (no matches, no crash)" in {
    val cp = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,120.0)["x"],GTAttrPredicate(value,"y"))){window:10}{windowType:count}""")
    val events = stream(100)
    val dr = new DsraRun(cp, "k") // the old regIdx build crashed here
    events.flatMap(dr.step) shouldBe empty
    val mr = new MatchRun(cp, "k")
    events.flatMap(e => mr.step(e)) shouldBe empty
  }
}
