package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** C10: SREMO register patterns on the nondeterministic runtime
  * (reference Specs/srem; docs/lang.md §SREMO). A sentence may declare a
  * register `["x"]` storing its matching event; later sentences compare
  * against the stored event via EQAttr/GTAttr/LTAttr/EQAttrStr.
  */
class SremoSpec extends AnyFlatSpec with Matchers {

  private def nev(id: Long, v: Double, t: String = "m") =
    CEvent(id, t, id, "", Map("value" -> v), Map.empty)

  "a register pattern" should "parse the [\"x\"] declaration" in {
    val p = SreParser.parsePattern(""";(GTPredicate(value,100.0)["x"],GTAttrPredicate(value,"x"))""")
    val Sre.Op(RegOp.SEQ, List(first, second)) = p.formula
    first shouldBe Sre.Sent(
      Sentence.Atomic(Predicate.GT("value", 100.0)), marked = true, register = Some("x"))
    second shouldBe Sre.Sent(Sentence.Atomic(Predicate.GTAttr("value", "x")))
  }

  it should "match pairs where the second value exceeds the stored first" in {
    // strict: spike (>100) immediately followed by a bigger spike
    val cp = Compiler.compileMatchOnly(
      """;(GTPredicate(value,100.0)["x"],GTAttrPredicate(value,"x"))""")
    val s = Seq(nev(1, 150), nev(2, 160), nev(3, 120), nev(4, 90), nev(5, 200), nev(6, 180))
    val out = MatchRun.run(cp, "", s.iterator).toList
    // pairs: (1,2): 160>150 ✓; (2,3): 120>160 ✗; (5,6): 180>200 ✗
    out.map(_.eventIds) shouldBe List(Seq(1L, 2L))
  }

  it should "work with skip-till-any and a count window" in {
    val cp = Compiler.compileMatchOnly(
      """#(;(GTPredicate(value,100.0)["x"],GTAttrPredicate(value,"x"))){window:4}{windowType:count}""")
    val s = Seq(nev(1, 150), nev(2, 50), nev(3, 170), nev(4, 40), nev(5, 160))
    val out = MatchRun.run(cp, "", s.iterator).toList
    // candidates: 1→3 (170>150 ✓), 1→5 (160>150 ✓ but span 5-1=4 >= window 4 ✗),
    // 3→5 (160>170 ✗)
    out.map(_.eventIds) shouldBe List(Seq(1L, 3L))
  }

  it should "compare string attributes via EQAttrStr" in {
    def tev(id: Long, t: String) = CEvent(id, t, id, "", Map.empty, Map.empty)
    // two consecutive events of the same type: a;a or b;b but not a;b
    val cp = Compiler.compileMatchOnly(
      """;(TruePredicate["x"],EQAttrStrPredicate(EventType,"x"))""")
    val s = Seq(tev(1, "a"), tev(2, "a"), tev(3, "b"), tev(4, "b"), tev(5, "a"))
    val out = MatchRun.run(cp, "", s.iterator).toList
    out.map(_.eventIds) shouldBe List(Seq(1L, 2L), Seq(3L, 4L))
  }

  "the SDFA compiler" should "reject register-reading patterns with a clear error" in {
    val ex = intercept[IllegalArgumentException] {
      Compiler.compile(""";(GTPredicate(value,100.0)["x"],GTAttrPredicate(value,"x"))""")
    }
    ex.getMessage should include("compileMatchOnly")
  }

  "register declarations without reads" should "still compile to the SDFA path" in {
    // a write-only register doesn't affect detection semantics
    val cp = Compiler.compile(""";(GTPredicate(value,100.0)["x"],LTPredicate(value,10.0))""")
    val s = Seq(nev(1, 150), nev(2, 5))
    val run = new DetRun(cp, "")
    s.flatMap(run.step).map(_.eventId) shouldBe Seq(2L)
  }
}
