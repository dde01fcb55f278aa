package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Golden end-to-end engine test, ported from the reference
  * (Wayeb/cef/src/test/scala/Specs/engine/EngineSpec.scala:18-42): the
  * pattern a;b over the stream a,b,a,b must yield exactly the matches
  * {1,2} and {3,4}.
  */
class EngineSpec extends AnyFlatSpec with Matchers {

  private def ev(id: Long, t: String): CEvent = CEvent.simple(id, t, id)

  private val abab = List(ev(1, "a"), ev(2, "b"), ev(3, "a"), ev(4, "b"))
  private val cp = Compiler.compile(
    ";(IsEventTypePredicate(a),IsEventTypePredicate(b))")

  "the pattern a;b on stream a,b,a,b" should "enumerate matches {1,2} and {3,4}" in {
    val out = MatchRun.run(cp, "", abab.iterator).toList
    out.map(_.eventIds) shouldBe List(Seq(1L, 2L), Seq(3L, 4L))
  }

  it should "detect at counters 2 and 4 deterministically" in {
    val run = new DetRun(cp, "")
    val dets = abab.flatMap(run.step)
    dets.map(_.counter) shouldBe List(2L, 4L)
    dets.map(_.eventId) shouldBe List(2L, 4L)
  }

  it should "survive a mid-stream reset" in {
    // a, RESET, b: the reset clears the partial match — no detection at b
    val run = new DetRun(cp, "")
    val stream = List(ev(1, "a"), CEvent.reset(""), ev(2, "b"))
    stream.flatMap(run.step) shouldBe Nil

    val out = MatchRun.run(cp, "", stream.iterator).toList
    out shouldBe Nil
  }

  "strict contiguity" should "not match a;b across a gap (a,a,b yields only {2,3})" in {
    val aab = List(ev(1, "a"), ev(2, "a"), ev(3, "b"))
    val out = MatchRun.run(cp, "", aab.iterator).toList
    out.map(_.eventIds) shouldBe List(Seq(2L, 3L))
  }

  "iteration" should "consume the whole contiguous run (a,c,c,b with a;c*;b)" in {
    val cp2 = Compiler.compile(
      ";(IsEventTypePredicate(a),*(IsEventTypePredicate(c)),IsEventTypePredicate(b))")
    val accb = List(ev(1, "a"), ev(2, "c"), ev(3, "c"), ev(4, "b"))
    val out = MatchRun.run(cp2, "", accb.iterator).toList
    out.map(_.eventIds) shouldBe List(Seq(1L, 2L, 3L, 4L))
    // and the empty iteration: a,b matches too
    val ab = List(ev(1, "a"), ev(2, "b"))
    MatchRun.run(cp2, "", ab.iterator).toList.map(_.eventIds) shouldBe List(Seq(1L, 2L))
  }

  "skip-till-any" should "enumerate every (a,b) pair" in {
    val cp2 = Compiler.compile("#(;(IsEventTypePredicate(a),IsEventTypePredicate(b)))")
    val s = List(ev(1, "a"), ev(2, "x"), ev(3, "a"), ev(4, "b"), ev(5, "b"))
    val out = MatchRun.run(cp2, "", s.iterator).toList
    out.map(_.eventIds).toSet shouldBe Set(
      Seq(1L, 4L), Seq(3L, 4L), Seq(1L, 5L), Seq(3L, 5L))
  }

  it should "respect a count window" in {
    val cp2 = Compiler.compile(
      "#(;(IsEventTypePredicate(a),IsEventTypePredicate(b))){window:3}{windowType:count}")
    // a@1 .. b@4 has span 3 (>= window 3) -> pruned; a@3..b@4 and a@3..b@5 survive
    val s = List(ev(1, "a"), ev(2, "x"), ev(3, "a"), ev(4, "b"), ev(5, "b"))
    val out = MatchRun.run(cp2, "", s.iterator).toList
    out.map(_.eventIds).toSet shouldBe Set(Seq(3L, 4L), Seq(3L, 5L))
  }

  it should "measure the window span from the FIRST taken event (3-element match)" in {
    // #( a;b;c ) with count window 4: a@1,b@3,c@5 spans 5-1=4 >= 4 → pruned;
    // a@2..c@5 spans 3 → kept. (Regression: the span was measured from the
    // most recent taken event, silently widening windows for 3+ matches.)
    val cp2 = Compiler.compile(
      "#(;(IsEventTypePredicate(a),IsEventTypePredicate(b),IsEventTypePredicate(c))){window:4}{windowType:count}")
    val s = List(ev(1, "a"), ev(2, "a"), ev(3, "b"), ev(4, "x"), ev(5, "c"))
    val out = MatchRun.run(cp2, "", s.iterator).toList
    out.map(_.eventIds).toSet shouldBe Set(Seq(2L, 3L, 5L))
  }

  it should "respect a time window" in {
    val cp2 = Compiler.compile(
      "#(;(IsEventTypePredicate(a),IsEventTypePredicate(b))){window:10}{windowType:time}")
    val s = List(
      CEvent.simple(1, "a", 100), CEvent.simple(2, "a", 95),
      CEvent.simple(3, "b", 104), CEvent.simple(4, "b", 111))
    // pairs within |ts_b - ts_a| < 10: (1,3) diff 4; (2,3) diff 9; (1,4) diff 11 no; (2,4) diff 16 no
    val out = MatchRun.run(cp2, "", s.iterator).toList
    out.map(_.eventIds).toSet shouldBe Set(Seq(1L, 3L), Seq(2L, 3L))
  }

  "skip-till-next" should "match each a with only the first following b" in {
    val cp2 = Compiler.compile("@(;(IsEventTypePredicate(a),IsEventTypePredicate(b)))")
    val s = List(ev(1, "a"), ev(2, "x"), ev(3, "a"), ev(4, "b"), ev(5, "b"))
    val out = MatchRun.run(cp2, "", s.iterator).toList
    out.map(_.eventIds).toSet shouldBe Set(Seq(1L, 4L), Seq(3L, 4L))
  }

  "choice" should "accept either branch ((a+c);b)" in {
    val cp2 = Compiler.compile(
      ";(+(IsEventTypePredicate(a),IsEventTypePredicate(c)),IsEventTypePredicate(b))")
    val s = List(ev(1, "c"), ev(2, "b"), ev(3, "a"), ev(4, "b"))
    val out = MatchRun.run(cp2, "", s.iterator).toList
    out.map(_.eventIds) shouldBe List(Seq(1L, 2L), Seq(3L, 4L))
  }

  "multi-pattern files" should "compile and run all patterns in one pass" in {
    val pats = SreParser.parseAll(
      """;(IsEventTypePredicate(a),IsEventTypePredicate(b)){order:1}
        |&
        |;(IsEventTypePredicate(b),IsEventTypePredicate(a))""".stripMargin)
    pats.size shouldBe 2
    val cps = pats.map(Compiler.compilePattern(_))
    val s = List(ev(1, "a"), ev(2, "b"), ev(3, "a"), ev(4, "b"))
    // pattern 0 (a;b) detects at 2 and 4; pattern 1 (b;a) at 3
    val runs = cps.map(new DetRun(_, ""))
    val dets = s.flatMap(e => runs.zipWithIndex.flatMap {
      case (r, i) => r.step(e).map(i -> _.eventId)
    })
    dets shouldBe List(0 -> 2L, 1 -> 3L, 0 -> 4L)
  }

  "numeric predicates" should "gate transitions on attribute values" in {
    def nev(id: Long, v: Double) =
      CEvent(id, "m", id, "", Map("value" -> v), Map.empty)
    val cp2 = Compiler.compile(";(GTPredicate(value,100.0),LTPredicate(value,10.0))")
    val s = List(nev(1, 150), nev(2, 5), nev(3, 50), nev(4, 120), nev(5, 9))
    val out = MatchRun.run(cp2, "", s.iterator).toList
    out.map(_.eventIds) shouldBe List(Seq(1L, 2L), Seq(4L, 5L))
  }
}
