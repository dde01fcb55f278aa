package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import Predicate._

/** C6: interval-algebra minterm pruning — the closed-form stand-in for the
  * reference's SAT-based simplification (LogicUtils.scala:236-340). The
  * alphabet must contain exactly the real-realizable truth assignments, and
  * a many-predicate same-attribute pattern must compile without the 2^k
  * blowup.
  */
class LogicSatSpec extends AnyFlatSpec with Matchers {

  private def assignOf(iso: Isomorphism, e: CEvent): Map[Predicate, Boolean] =
    iso.predicates.map(p => p -> p.eval(e)).toMap

  "minterm construction" should "prune contradictory same-attribute comparisons" in {
    // the reference's canonical example: GT(x,120) ∧ LT(x,10) is UNSAT
    val iso = Isomorphism.build(Set(GT("x", 120.0), LT("x", 10.0)), Set.empty)
    iso.minterms.exists(m => m(GT("x", 120.0)) && m(LT("x", 10.0))) shouldBe false
    iso.size shouldBe 3 // TT pruned; TF, FT, FF remain
  }

  it should "prune the all-false assignment when the complements contradict" in {
    // ¬GT(x,10) ∧ ¬LT(x,20) ⇒ x ≤ 10 ∧ x ≥ 20: empty
    val iso = Isomorphism.build(Set(GT("x", 10.0), LT("x", 20.0)), Set.empty)
    iso.size shouldBe 3
    iso.minterms.exists(m => !m(GT("x", 10.0)) && !m(LT("x", 20.0))) shouldBe false
  }

  it should "reason about EQ points inside BT bands" in {
    val eq = EQ("x", 5.0); val bt = BT("x", 10.0, 20.0)
    val iso = Isomorphism.build(Set(eq, bt), Set.empty)
    // x = 5 is outside [10, 20): both-true is UNSAT, everything else is SAT
    iso.minterms.exists(m => m(eq) && m(bt)) shouldBe false
    iso.size shouldBe 3

    val eqIn = EQ("x", 15.0)
    val iso2 = Isomorphism.build(Set(eqIn, bt), Set.empty)
    // x = 15 lies inside the band: EQ-true forces BT-true
    iso2.minterms.exists(m => m(eqIn) && !m(bt)) shouldBe false
    iso2.size shouldBe 3
  }

  it should "respect endpoint inclusion (BT is lo-inclusive, hi-exclusive)" in {
    val eqLo = EQ("x", 10.0); val eqHi = EQ("x", 20.0); val bt = BT("x", 10.0, 20.0)
    Isomorphism.build(Set(eqLo, bt), Set.empty)
      .minterms.exists(m => m(eqLo) && m(bt)) shouldBe true // 10 ∈ [10,20)
    Isomorphism.build(Set(eqHi, bt), Set.empty)
      .minterms.exists(m => m(eqHi) && m(bt)) shouldBe false // 20 ∉ [10,20)
  }

  it should "treat same-center circle predicates as distance intervals" in {
    val win = WithinCircle("lon", "lat", 23.6, 37.9, 5.0)
    val out = OutsideCircle("lon", "lat", 23.6, 37.9, 5.0)
    val ring = DistanceBetween("lon", "lat", 23.6, 37.9, 5.0, 8.0)
    val iso = Isomorphism.build(Set(win, out, ring), Set.empty)
    // win and out are complements; ring ⊆ out
    iso.minterms.exists(m => m(win) && m(out)) shouldBe false
    iso.minterms.forall(m => m(win) == !m(out)) shouldBe true
    iso.minterms.exists(m => m(ring) && !m(out)) shouldBe false
    // distances are implicitly non-negative: ¬win ∧ ¬out needs d < 0 ⇒ UNSAT
    iso.minterms.exists(m => !m(win) && !m(out)) shouldBe false
    iso.size shouldBe 3 // (win), (out, ¬ring), (out, ring)

    // different centers stay independent (no geometric reasoning attempted)
    val other = WithinCircle("lon", "lat", 0.0, 0.0, 1.0)
    val iso2 = Isomorphism.build(Set(win, other), Set.empty)
    iso2.size shouldBe 4
  }

  it should "compile a 12-comparison single-attribute pattern far below 2^12" in {
    // interleaved GT/LT thresholds over one attribute: the satisfiable
    // assignments are the 13 "staircase" cells, not 4096
    val preds: Set[Predicate] =
      (1 to 6).map(i => GT("x", i * 10.0): Predicate).toSet ++
        (1 to 6).map(i => LT("x", i * 10.0 + 5.0): Predicate).toSet
    val t0 = System.nanoTime()
    val iso = Isomorphism.build(preds, Set.empty)
    val ms = (System.nanoTime() - t0) / 1e6
    iso.size should be <= 16
    ms should be < 2000.0

    // every assignment in the alphabet is realized by some real value, and
    // every event maps to the symbol matching its actual predicate evals
    for (v <- Seq(0.0, 12.0, 15.0, 33.0, 47.5, 60.0, 65.0, 99.0)) {
      val e = CEvent(1, "a", 1, "", Map("x" -> v), Map.empty)
      val sym = iso.evaluate(e)
      sym should be >= 0
      iso.minterms(sym) shouldBe assignOf(iso, e)
    }
  }

  it should "keep NaN-carrying events on the reference's no-minterm path" in {
    // NaN fails every comparison; when the all-false assignment is real-
    // unsatisfiable the event maps to -1 (reference "no minterm" case)
    val iso = Isomorphism.build(Set(GT("x", 10.0), LT("x", 20.0)), Set.empty)
    val nan = CEvent(1, "a", 1, "", Map("x" -> Double.NaN), Map.empty)
    iso.evaluate(nan) shouldBe -1
    // but when the all-false cell is real-satisfiable, NaN shares it
    val iso2 = Isomorphism.build(Set(GT("x", 120.0), LT("x", 10.0)), Set.empty)
    val sym = iso2.evaluate(nan)
    sym should be >= 0
    iso2.minterms(sym).values.forall(_ == false) shouldBe true
  }

  it should "leave exclusives and event-type pruning unchanged" in {
    val a = IsEventType("a"); val b = IsEventType("b")
    val iso = Isomorphism.build(Set(a, b, GT("x", 5.0)), Set.empty)
    // auto-exclusive types: never both true → 3 type cells × 2 = 6
    iso.size shouldBe 6
    iso.minterms.exists(m => m(a) && m(b)) shouldBe false
  }
}
