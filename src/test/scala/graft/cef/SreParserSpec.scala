package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class SreParserSpec extends AnyFlatSpec with Matchers {
  import Sre._
  import Sentence._
  import Predicate._

  "the SRE parser" should "parse the reference demo pattern" in {
    // Wayeb/patterns/demo/a_seq_b_or_c.sre
    val p = SreParser.parsePattern(
      ";(IsEventTypePredicate(A),+(IsEventTypePredicate(B),IsEventTypePredicate(C))){order:2}")
    p.order shouldBe 2
    p.formula shouldBe Op(RegOp.SEQ, List(
      Sent(Atomic(IsEventType("A"))),
      Op(RegOp.CHOICE, List(Sent(Atomic(IsEventType("B"))), Sent(Atomic(IsEventType("C")))))))
  }

  it should "parse all flags" in {
    val p = SreParser.parsePattern(
      "*(IsEventTypePredicate(A)){order:3}{partitionBy:mmsi}{window:10}{windowType:time}")
    p.order shouldBe 3
    p.partitionBy shouldBe Some("mmsi")
    p.window shouldBe 10L
    p.windowKind shouldBe WindowKind.Time
  }

  it should "parse logic connectives with prefix notation" in {
    val p = SreParser.parsePattern("|(GTPredicate(speed,5.0),-(IsEventTypePredicate(A)))")
    p.formula shouldBe Sent(Or(List(
      Atomic(GT("speed", 5.0)),
      Not(Atomic(IsEventType("A"))))))
  }

  it should "parse spatial predicates with negative coordinates" in {
    val p = SreParser.parsePattern("WithinCirclePredicate(lon,lat,-24.922,60.16,5.0)")
    p.formula shouldBe Sent(Atomic(WithinCircle("lon", "lat", -24.922, 60.16, 5.0)))
  }

  it should "parse multi-pattern files separated by &" in {
    val ps = SreParser.parseAll(
      """;(IsEventTypePredicate(A),IsEventTypePredicate(B)){order:1}
        |&
        |*(IsEventTypePredicate(C))""".stripMargin)
    ps.size shouldBe 2
    ps.head.order shouldBe 1
  }

  it should "parse selection strategy wrappers" in {
    SreParser.parsePattern("#(;(IsEventTypePredicate(A),IsEventTypePredicate(B)))").formula shouldBe
      Op(RegOp.ANY, List(Op(RegOp.SEQ, List(Sent(Atomic(IsEventType("A"))), Sent(Atomic(IsEventType("B")))))))
    SreParser.parsePattern("@(*(IsEventTypePredicate(A)))").formula shouldBe
      Op(RegOp.NEXT, List(Op(RegOp.ITER, List(Sent(Atomic(IsEventType("A")))))))
  }

  it should "reject malformed input" in {
    an[IllegalArgumentException] should be thrownBy SreParser.parsePattern("*(A,B)")
    an[IllegalArgumentException] should be thrownBy SreParser.parsePattern(";(IsEventTypePredicate(A)")
    an[IllegalArgumentException] should be thrownBy SreParser.parsePattern("NoSuchPredicate(A)")
  }

  "the declarations parser" should "parse extras and exclusives" in {
    val (extras, excl) = SreParser.parseDeclarations(
      "+(GTPredicate(speed,5.0)) & ~(IsEventTypePredicate(A),IsEventTypePredicate(B))")
    extras shouldBe Set(GT("speed", 5.0))
    excl shouldBe Set(Set[Predicate](IsEventType("A"), IsEventType("B")))
  }

  "spatial math" should "compute haversine distances like the reference (6371 km radius)" in {
    // Piraeus to Heraklion ≈ 320 km
    val d = Spatial.haversineKm(23.64, 37.94, 25.13, 35.34)
    d shouldBe 318.0 +- 15.0
    Spatial.haversineKm(10, 50, 10, 50) shouldBe 0.0 +- 1e-9
  }
}
