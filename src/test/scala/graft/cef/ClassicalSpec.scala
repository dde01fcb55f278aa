package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** C9 cross-validation in the reference's style (Specs/symbolic/engine/
  * DFAeqSDFA.scala, Specs/classical/nfa/NFA2DFA.scala): the classical DFA
  * over event types and the symbolic SDFA built from IsEventType predicates
  * must accept exactly the same words, for random patterns × random words.
  */
class ClassicalSpec extends AnyFlatSpec with Matchers {

  private val rnd = new Random(77)
  private val alphabet = Vector("a", "b", "c")

  private def randTree(depth: Int): RegExpTree =
    if (depth == 0) RegExpTree.Sym(alphabet(rnd.nextInt(3)))
    else rnd.nextInt(4) match {
      case 0 => RegExpTree.Concat(List.fill(2)(randTree(depth - 1)))
      case 1 => RegExpTree.Union(List.fill(2)(randTree(depth - 1)))
      case 2 => RegExpTree.Star(randTree(depth - 1))
      case 3 => RegExpTree.Sym(alphabet(rnd.nextInt(3)))
    }

  "classical DFA and symbolic SDFA" should "accept the same words for random patterns" in {
    var checked = 0
    for (_ <- 1 to 40) {
      val tree = randTree(2)
      val dfa = Classical.compile(tree, alphabet)
      val cp = Compiler.compilePattern(Pattern(Classical.toSre(tree)))
      for (_ <- 1 to 20) {
        val word = List.fill(rnd.nextInt(7))(alphabet(rnd.nextInt(3)))
        val events = word.zipWithIndex.map { case (c, i) => CEvent.simple(i + 1, c, i + 1) }
        withClue(s"tree $tree word $word: ") {
          dfa.accepts(word) shouldBe cp.snfa.accepts(events)
        }
        checked += 1
      }
    }
    info(s"$checked classical×symbolic agreement checks")
  }

  it should "agree with hand-computed languages" in {
    import RegExpTree._
    // (a|b)*c
    val t = Concat(List(Star(Union(List(Sym("a"), Sym("b")))), Sym("c")))
    val dfa = Classical.compile(t, alphabet)
    dfa.accepts(Seq("c")) shouldBe true
    dfa.accepts(Seq("a", "b", "a", "c")) shouldBe true
    dfa.accepts(Seq("a", "c", "a")) shouldBe false
    dfa.accepts(Seq()) shouldBe false
    dfa.accepts(Seq("c", "c")) shouldBe false
  }
}
