package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** Randomized equivalence for the match-enumeration runtime: MatchRun must
  * produce exactly the match id-sets of a brute-force enumerator that
  * tries every contiguous substream against every accepting NFA path
  * (recording the events consumed by TAKE transitions). Mid-flight window
  * pruning is equivalent to filtering on the final match span, which the
  * brute force applies directly.
  */
class MatchEnumSpec extends AnyFlatSpec with Matchers {

  private val rnd = new Random(42)
  private val types = Vector("a", "b", "c")

  private def randFormula(depth: Int): Sre =
    if (depth == 0) Sre.Sent(Sentence.Atomic(Predicate.IsEventType(types(rnd.nextInt(3)))))
    else rnd.nextInt(5) match {
      case 0 => Sre.Op(RegOp.SEQ, List.fill(2 + rnd.nextInt(2))(randFormula(depth - 1)))
      case 1 => Sre.Op(RegOp.CHOICE, List.fill(2)(randFormula(depth - 1)))
      case 2 => Sre.Op(RegOp.ITER, List(randFormula(depth - 1)))
      case 3 => Sre.Op(RegOp.ANY, List(Sre.Op(RegOp.SEQ, List.fill(2)(randFormula(depth - 1)))))
      case 4 => Sre.Sent(Sentence.Atomic(Predicate.IsEventType(types(rnd.nextInt(3)))))
    }

  /** All (marked-id-list) sets of accepting runs over the substream
    * starting at index `i0` (0-based), via DFS over the ε-free NFA. */
  private def bruteMatches(cp: CompiledPattern, events: IndexedSeq[CEvent]): Set[List[Long]] = {
    val nfa = cp.snfa
    val out = scala.collection.mutable.Set.empty[List[Long]]
    def go(state: Int, idx: Int, taken: List[Long], firstC: Long): Unit = {
      if (nfa.finals.contains(state) && taken.nonEmpty) out += taken.reverse
      if (idx < events.length) {
        val e = events(idx)
        val counter = idx + 1L
        val windowOk = cp.window == 0L || firstC == -1L || {
          val diff = cp.windowKind match {
            case WindowKind.Count => counter - firstC
            case WindowKind.Time  => math.abs(e.timestamp - events((firstC - 1).toInt).timestamp)
          }
          diff < cp.window
        }
        if (windowOk) {
          nfa.bySrc(state).foreach { t =>
            if (t.guard.exists(_.eval(e))) {
              if (t.take) go(t.dst, idx + 1, e.id :: taken, if (firstC == -1L) counter else firstC)
              else go(t.dst, idx + 1, taken, firstC)
            }
          }
        }
      }
    }
    (0 until events.length).foreach(i0 => go(nfa.start, i0, Nil, -1L))
    out.toSet
  }

  it should "agree with brute-force path enumeration on random patterns, streams and windows" in {
    var checked = 0
    for (trial <- 1 to 60) {
      val f = randFormula(1 + rnd.nextInt(2))
      val window = if (rnd.nextBoolean()) 0L else 2L + rnd.nextInt(4)
      val pat = Pattern(f, window = window, windowKind = WindowKind.Count)
      val cp =
        try Compiler.compilePattern(pat)
        catch { case e: Throwable => fail(s"trial $trial: $f failed to compile: $e") }
      for (_ <- 1 to 5) {
        val n = 4 + rnd.nextInt(5)
        val events = (1 to n).map(i => CEvent.simple(i.toLong, types(rnd.nextInt(3)), i.toLong))
        val engine = MatchRun.run(cp, "", events.iterator).map(_.eventIds.toList).toSet
        val brute = bruteMatches(cp, events)
        withClue(s"trial $trial formula $f window $window stream ${events.map(_.eventType)}: ") {
          engine shouldBe brute
        }
        checked += 1
      }
    }
    info(s"$checked pattern×stream match-set equivalence checks")
  }

  "the thread-population guard" should "bound memory on adversarial unwindowed skip-till-any streams" in {
    // #(;(a, b)) with no window: every 'a' leaves a live partial match
    // forever — the population grows linearly without the guard
    val cp = Compiler.compile("#(;(IsEventTypePredicate(a),IsEventTypePredicate(b)))")
    val cap = 50
    val run = new MatchRun(cp, "k", maxThreads = cap)
    (1 to 400).foreach { i =>
      run.step(CEvent.simple(i, "a", i))
      run.activeThreads should be <= cap
    }
    run.evictedThreads shouldBe 350L // oldest partials dropped, newest kept
    // a closing 'b' completes one match per surviving partial
    val ms = run.step(CEvent.simple(401, "b", 401))
    ms.size shouldBe cap
    // the survivors are the MOST RECENT 'a's (RunPool-expiration analogue)
    ms.map(_.eventIds.head).toSet shouldBe (351L to 400L).toSet
    // default leaves ordinary runs untouched
    val unguarded = new MatchRun(cp, "k")
    (1 to 400).foreach(i => unguarded.step(CEvent.simple(i, "a", i)))
    unguarded.evictedThreads shouldBe 0L
    unguarded.step(CEvent.simple(401, "b", 401)).size shouldBe 400
  }
}
