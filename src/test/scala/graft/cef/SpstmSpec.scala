package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** SPSTm (register-pattern forecasting over the DSRA runtime): the wt
  * recursion must equal exhaustive path enumeration (the WtSpec
  * discipline), and the runtime-trace symbolization must equal its
  * first-principles definition — detection points from the enumeration
  * runtime, anchors at arming events, age capped at the window.
  */
class SpstmSpec extends AnyFlatSpec with Matchers {

  private val rnd = new Random(29)

  /** A random order-2 PST over the 3-letter trace alphabet. */
  private def randomPst(): Pst = {
    val cst = new Cst
    val syms = Seq(SpstM.SymO, SpstM.SymA, SpstM.SymD)
    var w = List.empty[Int]
    (1 to 400).foreach { _ =>
      // biased stream: mostly O, bursts of A, occasional D
      val s = rnd.nextInt(10) match {
        case 0 | 1 => SpstM.SymA
        case 2     => SpstM.SymD
        case _     => SpstM.SymO
      }
      w = (s :: w).take(3)
      cst.add(w)
    }
    require(syms.forall(cst.symbols.contains), "all three symbols must occur")
    PstLearner.learn(cst, maxOrder = 2, pMin = 0.001, alpha = 0.05,
      gammaMin = 0.001, r = 1.05)
  }

  /** Brute force: enumerate every symbol sequence up to the horizon,
    * accumulating first-detection mass per step (no merging, no cutoff).
    */
  private def bruteWt(
      m: SpstM, label: List[Int], state: Int, h: Int): Map[Int, Double] = {
    val wt = scala.collection.mutable.Map.empty[Int, Double].withDefaultValue(0.0)
    def go(lbl: List[Int], st: Int, t: Int, p: Double): Unit =
      if (t <= h) {
        (0 until m.nSymbols).foreach { sym =>
          val p2 = p * m.pst.condProbFor(sym, lbl)
          if (p2 > 0) {
            if (m.hit(st)(sym)) wt(t) += p2
            else go(m.pst.nodeFor(sym :: lbl).label, m.delta(st)(sym), t + 1, p2)
          }
        }
      }
    go(label, state, 1, 1.0)
    wt.toMap
  }

  "SpstM wt distributions" should "match brute-force path enumeration (cutoff 0)" in {
    val w = 4
    val (delta, hit) = SpstM.anchorAgeTables(w)
    (1 to 5).foreach { _ =>
      val m = SpstM(randomPst(), 2, delta, hit)
      val h = 7
      for (leaf <- m.pst.leaves.map(_.label).distinct; st <- 0 to w) {
        val wt = m.wtDistribution(leaf, st, h, cutoff = 0.0)
        val brute = bruteWt(m, leaf, st, h)
        (1 to h).foreach { t =>
          withClue(s"label $leaf state $st t $t: ") {
            wt(t) shouldBe brute.getOrElse(t, 0.0) +- 1e-12
          }
        }
      }
    }
  }

  it should "give idle states strictly later detections than fresh anchors" in {
    val w = 6
    val (delta, hit) = SpstM.anchorAgeTables(w)
    val m = SpstM(randomPst(), 2, delta, hit)
    // from the idle state, a detection at t=1 is impossible (hit needs
    // age <= w-2) — mass at t=1 must be zero; a fresh anchor admits it
    val lbl = m.pst.leaves.head.label
    m.wtDistribution(lbl, w, 5, cutoff = 0.0).wt.getOrElse(1, 0.0) shouldBe 0.0
  }

  "the DSRA runtime trace" should "equal its first-principles definition" in {
    val cp = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,120.0)["x"],GTAttrPredicate(value,"x"))){window:10}{windowType:count}""")
    val W = cp.window
    (1 to 15).foreach { _ =>
      val events = (1 to (60 + rnd.nextInt(80))).map(i =>
        CEvent(i.toLong, "v", i.toLong, "k",
          Map("value" -> rnd.nextInt(200).toDouble), Map.empty))
      // first principles: detections from the enumeration runtime; an
      // event arms iff value > 120; age = position - last arming position
      val mr = new MatchRun(cp, "k")
      val detAt = events.zipWithIndex.collect {
        case (e, i) if mr.step(e).nonEmpty => i + 1
      }.toSet
      var lastArm = -1L
      val expected = events.zipWithIndex.map { case (e, i) =>
        val pos = i + 1L
        val arming = e.num("value") > 120.0
        if (arming) lastArm = pos
        val sym =
          if (detAt(pos.toInt)) SpstM.SymD
          else if (arming) SpstM.SymA
          else SpstM.SymO
        val age = if (lastArm < 0) W else math.min(pos - lastArm, W)
        (pos, sym, age.toInt)
      }
      // runtime trace: the Detect.dsraTrace per-event derivation
      val dr = new DsraRun(cp, "k")
      val got = events.map { e =>
        val det = dr.step(e)
        val counter = dr.eventCounter
        val anchor = dr.newestTakenAnchor
        val sym =
          if (det.isDefined) SpstM.SymD
          else if (dr.tookAnchorThisStep) SpstM.SymA
          else SpstM.SymO
        val age = if (anchor < 0) W else math.min(counter - anchor, W)
        (counter, sym, age.toInt)
      }
      got shouldBe expected
    }
  }

  it should "equal its first-principles definition for TIME windows on the age grid" in {
    // window 40 time units, grid 10 → 4 age cells; irregular event-time
    // gaps (0..12 units — gap 0 produces the same-timestamp TIES that
    // distinguish the explicit arming signal from anchor==ts equality:
    // a non-arming event tying an arming event's timestamp must stay
    // SymO) so cell boundaries, ties, and the idle cap are all hit
    val cp = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,120.0)["x"],GTAttrPredicate(value,"x"))){window:40}{windowType:time}""")
    val W = 40L
    val grid = 10L
    val cells = (W / grid).toInt
    (1 to 15).foreach { _ =>
      var ts = 0L
      val events = (1 to (60 + rnd.nextInt(80))).map { i =>
        ts += rnd.nextInt(13)
        CEvent(i.toLong, "v", ts, "k",
          Map("value" -> rnd.nextInt(200).toDouble), Map.empty)
      }
      // first principles: detections from the enumeration runtime; an
      // event arms iff value > 120; age = (event time − last arming
      // time) bucketed to the grid, capped at the cell count (= idle)
      val mr = new MatchRun(cp, "k")
      val detAt = events.zipWithIndex.collect {
        case (e, i) if mr.step(e).nonEmpty => i + 1
      }.toSet
      var lastArmTs = -1L
      val expected = events.zipWithIndex.map { case (e, i) =>
        val pos = i + 1L
        val arming = e.num("value") > 120.0
        if (arming) lastArmTs = e.timestamp
        val sym =
          if (detAt(pos.toInt)) SpstM.SymD
          else if (arming) SpstM.SymA
          else SpstM.SymO
        val age =
          if (lastArmTs < 0) cells.toLong
          else math.min((e.timestamp - lastArmTs) / grid, cells.toLong)
        (pos, sym, age.toInt)
      }
      // runtime trace: the Detect.dsraTrace time-window derivation
      val dr = new DsraRun(cp, "k")
      val got = events.map { e =>
        val det = dr.step(e)
        val counter = dr.eventCounter
        val anchor = dr.newestTakenAnchor
        val sym =
          if (det.isDefined) SpstM.SymD
          else if (dr.tookAnchorThisStep) SpstM.SymA
          else SpstM.SymO
        val age =
          if (anchor < 0) cells.toLong
          else math.min((e.timestamp - anchor) / grid, cells.toLong)
        (counter, sym, age.toInt)
      }
      got shouldBe expected
    }
  }
}
