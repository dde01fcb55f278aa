package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** C8 specs in the reference's style (Specs/symbolic/sdfa + classical
  * DisSpec): the disambiguated automaton must be language-equivalent AND
  * m-unambiguous — the state reached by any word of length ≥ m uniquely
  * determines the last m symbols.
  */
class DisambiguatorSpec extends AnyFlatSpec with Matchers {

  private val rnd = new Random(21)
  private val types = Vector("a", "b", "c")

  private def randFormula(depth: Int): Sre =
    if (depth == 0) Sre.Sent(Sentence.Atomic(Predicate.IsEventType(types(rnd.nextInt(3)))))
    else rnd.nextInt(4) match {
      case 0 => Sre.Op(RegOp.SEQ, List.fill(2)(randFormula(depth - 1)))
      case 1 => Sre.Op(RegOp.CHOICE, List.fill(2)(randFormula(depth - 1)))
      case 2 => Sre.Op(RegOp.ITER, List(randFormula(depth - 1)))
      case 3 => Sre.Sent(Sentence.Atomic(Predicate.IsEventType(types(rnd.nextInt(3)))))
    }

  private def randWord(n: Int): List[CEvent] =
    (1 to n).toList.map(i => CEvent.simple(i.toLong, types(rnd.nextInt(3)), i.toLong))

  "disambiguation" should "preserve the language and achieve m-unambiguity" in {
    for (trial <- 1 to 30; m <- 1 to 2) {
      val cp = Compiler.compilePattern(Pattern(randFormula(2)))
      val dis = Disambiguator.disambiguate(cp.sdfa, m)

      // m-unambiguity: state → unique last-m symbol window, checked by
      // replaying random words and recording (state, window) pairs
      val seen = scala.collection.mutable.Map.empty[Int, List[Int]]
      for (_ <- 1 to 30) {
        val w = randWord(3 + rnd.nextInt(6))
        var s = dis.sdfa.start
        val window = scala.collection.mutable.ListBuffer.empty[Int]
        w.foreach { e =>
          val sym = cp.iso.evaluate(e)
          s = dis.sdfa.next(s, sym)
          window += sym
          if (window.size >= m) {
            val lastM = window.takeRight(m).toList
            withClue(s"trial $trial m=$m state $s: ") {
              seen.getOrElseUpdate(s, lastM) shouldBe lastM
            }
          }
        }
        // language equivalence on every prefix
        cp.sdfa.accepts(w) shouldBe dis.sdfa.accepts(w)
      }

      // the recorded suffix matches the construction's declared suffix
      seen.foreach { case (s, w) => dis.suffix(s).takeRight(m) shouldBe w }
      // projection maps back to original states consistently
      dis.projection.length shouldBe dis.sdfa.nStates
    }
  }

  it should "be the identity at order 0" in {
    val cp = Compiler.compile(";(IsEventTypePredicate(a),IsEventTypePredicate(b))")
    val dis = Disambiguator.disambiguate(cp.sdfa, 0)
    dis.sdfa shouldBe cp.sdfa
  }

  "an order-1 chain on the disambiguated SDFA" should "give exact wt for an order-1 source" in {
    // source: after x (symbol for 'a'), always 'b'; the plain SDFA for
    // TRUE*;(a;b) conflates histories, the disambiguated one does not
    val cp = Compiler.compile(";(IsEventTypePredicate(a),IsEventTypePredicate(b))")
    val dis = Disambiguator.disambiguate(cp.sdfa, 1)
    dis.sdfa.nStates should be >= cp.sdfa.nStates
    // every state of the refined automaton determines its incoming symbol
    (0 until dis.sdfa.nStates).foreach { s =>
      val incoming = for {
        p <- 0 until dis.sdfa.nStates
        m <- 0 until cp.iso.size
        if dis.sdfa.delta(p)(m) == s
      } yield m
      incoming.distinct.size should be <= 1
    }
  }

  "remaining percentage" should "be 0 at finals, 1 at the farthest state, -1 when unreachable" in {
    val cp = Compiler.compile(
      ";(IsEventTypePredicate(a),IsEventTypePredicate(b),IsEventTypePredicate(c))")
    val sdfa = cp.sdfa
    val rp = sdfa.remainingPercentage
    sdfa.finals.foreach { f => rp(f) shouldBe 0.0 }
    rp.max shouldBe 1.0
    // monotone along any accepting path: start is among the farthest
    rp(sdfa.start) shouldBe 1.0
  }
}
