package graft.cef

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** CST / PST specs in the reference's style (Specs/vmm): counts checked
  * against naive substring counting, learned trees against direct
  * probability estimates.
  */
class VmmSpec extends AnyFlatSpec with Matchers {

  private val rnd = new Random(7)

  /** Build a CST the way the runtime does: push the window ending at every
    * position (length ≤ maxLen). */
  private def cstOf(stream: Seq[Int], maxLen: Int): Cst = {
    val cst = new Cst
    val buf = new SymbolBuffer(maxLen)
    stream.foreach { s => buf.push(s); cst.add(buf.pop) }
    cst
  }

  /** Naive count of occurrences of `word` (most-recent-first) in the stream:
    * positions t where the last |word| symbols ending at t spell the word. */
  private def naiveCount(stream: Seq[Int], word: List[Int]): Int = {
    val rev = word.reverse // oldest-first
    (rev.size to stream.size).count(t => stream.slice(t - rev.size, t) == rev)
  }

  "a CST built from a stream" should "count every window like naive substring counting" in {
    for (_ <- 1 to 20) {
      val alphabet = 3
      val stream = Seq.fill(60)(rnd.nextInt(alphabet))
      val cst = cstOf(stream, 4)
      cst.count shouldBe 60
      // all words up to length 4
      def words(l: Int): Seq[List[Int]] =
        if (l == 0) Seq(Nil)
        else words(l - 1).flatMap(w => (0 until alphabet).map(s => s :: w))
      for (l <- 1 to 4; w <- words(l)) {
        cst.counterFor(w) shouldBe naiveCount(stream, w).toLong
      }
    }
  }

  it should "estimate conditional probabilities from counts" in {
    val stream = Seq(0, 1, 0, 1, 0, 1, 0, 1, 0, 1)
    val cst = cstOf(stream, 3)
    // after a 0, always a 1
    cst.condProbFor(1, List(0)) shouldBe 1.0
    cst.condProbFor(0, List(0)) shouldBe 0.0
    // after a 1, always a 0 — except the final 1, which has no successor
    // (the reference notes the same boundary effect, CounterSuffixTree.scala:217)
    cst.condProbFor(0, List(1)) shouldBe 0.8
  }

  "the PST learner" should "learn a deterministic order-1 source exactly (modulo smoothing)" in {
    // alternating 0,1: P(1|0)=1, P(0|1)=1
    val stream = Seq.tabulate(200)(_ % 2)
    val cst = cstOf(stream, 3)
    val gamma = 0.001
    val pst = PstLearner.learn(cst, maxOrder = 2, pMin = 0.001, alpha = 0.05, gammaMin = gamma, r = 1.05)
    // smoothed: p*(1-2γ)+γ
    pst.condProbFor(1, List(0)) shouldBe (1.0 * (1 - 2 * gamma) + gamma) +- 1e-12
    pst.condProbFor(0, List(0)) shouldBe (0.0 * (1 - 2 * gamma) + gamma) +- 1e-12
    // distributions sum to 1 at every node
    pst.nodes.foreach { n => n.dist.values.sum shouldBe 1.0 +- 1e-9 }
  }

  it should "not grow deeper than needed for a memoryless source" in {
    // iid uniform symbols: no context is meaningful, tree should stay shallow
    val stream = Seq.fill(2000)(rnd.nextInt(2))
    val cst = cstOf(stream, 4)
    val pst = PstLearner.learn(cst, maxOrder = 3, pMin = 0.01, alpha = 0.5, gammaMin = 0.01, r = 1.5)
    // depth 0 or 1 expected: no conditional deviates enough to justify depth
    pst.nodes.map(_.label.length).max should be <= 1
  }

  it should "grow a deep branch for a genuinely order-2 source" in {
    // source: symbol = XOR of the previous two (deterministic order 2)
    val buf = scala.collection.mutable.ArrayBuffer(0, 1)
    while (buf.size < 400) buf += (buf(buf.size - 1) ^ buf(buf.size - 2))
    // XOR of alternating: 0,1,1,0,1,1,... — use a noisy variant to avoid degeneracy
    val stream = buf.toSeq
    val cst = cstOf(stream, 3)
    val pst = PstLearner.learn(cst, maxOrder = 2, pMin = 0.001, alpha = 0.05, gammaMin = 0.001, r = 1.05)
    pst.nodes.map(_.label.length).max shouldBe 2
    // learned order-2 conditionals match the deterministic source
    pst.condProbFor(0, List(1, 1)) should be > 0.99 // after (recent=1, older=1) comes 0
    pst.condProbFor(1, List(1, 0)) should be > 0.99 // after (recent=1, older=0) comes 1
  }

  "the symbol buffer" should "behave like the reference CyclicBuffer" in {
    val b = new SymbolBuffer(3)
    b.pop shouldBe Nil
    b.push(1); b.pop shouldBe List(1)
    b.push(2); b.pop shouldBe List(2, 1)
    b.push(3); b.pop shouldBe List(3, 2, 1)
    b.push(4); b.pop shouldBe List(4, 3, 2) // oldest evicted
    b.isFull shouldBe true
    val snap = b.snapshot
    val b2 = new SymbolBuffer(3)
    b2.restore(snap)
    b2.pop shouldBe List(4, 3, 2)
  }
}
