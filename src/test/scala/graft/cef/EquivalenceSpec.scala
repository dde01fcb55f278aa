package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** Randomized cross-model equivalence, mirroring the reference's dominant
  * test pattern (Specs/symbolic/engine/SNFAeqSDFA.scala:21-66 with
  * utils/testing/PatternGenerator.scala): random patterns × random streams,
  * three implementations must agree —
  *   1. denotational formula semantics ([[Denot]]),
  *   2. the ε-free SNFA (`accepts`),
  *   3. the determinized streaming SDFA.
  */
class EquivalenceSpec extends AnyFlatSpec with Matchers {

  private val rnd = new Random(42)
  private val types = Vector("a", "b", "c")

  private def randSentence(): Sentence = rnd.nextInt(6) match {
    case 0 | 1 | 2 => Sentence.Atomic(Predicate.IsEventType(types(rnd.nextInt(types.size))))
    case 3 => Sentence.Atomic(Predicate.GT("v", 10.0 * (1 + rnd.nextInt(3))))
    case 4 => Sentence.Or(List(randSentence0(), randSentence0()))
    case 5 => Sentence.Not(randSentence0())
  }
  private def randSentence0(): Sentence =
    Sentence.Atomic(
      if (rnd.nextBoolean()) Predicate.IsEventType(types(rnd.nextInt(types.size)))
      else Predicate.GT("v", 10.0 * (1 + rnd.nextInt(3))))

  private def randFormula(depth: Int): Sre =
    if (depth == 0) Sre.Sent(randSentence())
    else rnd.nextInt(6) match {
      case 0 | 1 => Sre.Op(RegOp.SEQ, List.fill(2 + rnd.nextInt(2))(randFormula(depth - 1)))
      case 2     => Sre.Op(RegOp.CHOICE, List.fill(2)(randFormula(depth - 1)))
      case 3     => Sre.Op(RegOp.ITER, List(randFormula(depth - 1)))
      case 4     => Sre.Op(RegOp.NEG, List(randFormula(depth - 1)))
      case 5     => Sre.Sent(randSentence())
    }

  private def randWord(n: Int): List[CEvent] =
    (1 to n).toList.map(i =>
      CEvent(i.toLong, types(rnd.nextInt(types.size)), i.toLong, "",
        Map("v" -> (rnd.nextInt(5) * 10).toDouble), Map.empty))

  "SNFA, SDFA and formula semantics" should "agree on random patterns and words" in {
    var checked = 0
    for (trial <- 1 to 60) {
      val f = randFormula(2)
      val cp =
        try Compiler.compilePattern(Pattern(f))
        catch { case e: Throwable => fail(s"trial $trial failed to compile $f: $e") }
      val streamSnfa = Thompson.streaming(cp.snfa)
      for (_ <- 1 to 8) {
        val w = randWord(rnd.nextInt(7))
        val denot = Denot.matches(f, w)
        val viaSnfa = cp.snfa.accepts(w)
        withClue(s"formula $f word ${w.map(_.eventType)}") {
          viaSnfa shouldBe denot
          val denotStream = Denot.matchesSuffix(f, w)
          streamSnfa.accepts(w) shouldBe denotStream
          cp.sdfa.accepts(w) shouldBe denotStream
        }
        checked += 1
      }
    }
    info(s"$checked pattern×word checks")
  }

  "selection-strategy rewrites" should "preserve language per their spec" in {
    // any(a;b) over w  ⟺  ∃ split: a, anything, b
    val a = Sre.Sent(Sentence.Atomic(Predicate.IsEventType("a")))
    val b = Sre.Sent(Sentence.Atomic(Predicate.IsEventType("b")))
    val anySeq = Selection.rewrite(Sre.Op(RegOp.ANY, List(Sre.Op(RegOp.SEQ, List(a, b)))))
    val nextSeq = Selection.rewrite(Sre.Op(RegOp.NEXT, List(Sre.Op(RegOp.SEQ, List(a, b)))))
    for (_ <- 1 to 200) {
      val w = randWord(rnd.nextInt(7))
      val ts = w.map(_.eventType)
      val expAny = ts.nonEmpty && ts.head == "a" && ts.last == "b" && ts.size >= 2
      Denot.matches(anySeq, w) shouldBe expAny
      // next(a;b): a, then a gap with no b anywhere inside, then b
      val expNext = ts.size >= 2 && ts.head == "a" && ts.last == "b" &&
        !ts.slice(1, ts.size - 1).contains("b")
      Denot.matches(nextSeq, w) shouldBe expNext
    }
  }

  "double complement" should "be an involution on the language" in {
    for (trial <- 1 to 25) {
      val f = randFormula(1)
      val ff = Sre.Op(RegOp.NEG, List(Sre.Op(RegOp.NEG, List(f))))
      val cpF = Compiler.compilePattern(Pattern(f))
      val cpFF = Compiler.compilePattern(Pattern(ff))
      for (_ <- 1 to 12) {
        val w = randWord(rnd.nextInt(6))
        withClue(s"trial $trial formula $f word ${w.map(_.eventType)}: ") {
          cpFF.snfa.accepts(w) shouldBe cpF.snfa.accepts(w)
        }
      }
    }
  }

  "complement" should "partition all words with the original language" in {
    for (_ <- 1 to 25) {
      val f = randFormula(1)
      val nf = Sre.Op(RegOp.NEG, List(f))
      val cpF = Compiler.compilePattern(Pattern(f))
      val cpN = Compiler.compilePattern(Pattern(nf))
      for (_ <- 1 to 12) {
        val w = randWord(rnd.nextInt(6))
        cpN.snfa.accepts(w) shouldBe !cpF.snfa.accepts(w)
      }
    }
  }

  "the minterm alphabet" should "map every event to exactly one symbol" in {
    for (_ <- 1 to 40) {
      val f = randFormula(2)
      val cp = Compiler.compilePattern(Pattern(f))
      randWord(10).foreach { e =>
        val sym = cp.iso.evaluate(e)
        sym should be >= 0
        // the symbol's defining sentence is satisfied by the event, and no
        // other minterm's sentence is
        cp.iso.sentenceOf(sym).eval(e) shouldBe true
        (0 until cp.iso.size).filter(m => cp.iso.sentenceOf(m).eval(e)) shouldBe Seq(sym)
      }
    }
  }
}
