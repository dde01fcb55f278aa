package graft.cef

import scala.collection.mutable

/** C9: the classical (non-symbolic) automaton path — regexp over a finite
  * event-type alphabet → NFA → DFA (reference fsm/classical/fa/nfa/
  * NFAUtils.scala:1-323, fsm/classical/fa/dfa). The reference keeps this
  * purely as a cross-validation harness: the classical DFA over event
  * types must agree with the symbolic SDFA built from IsEventType
  * predicates (Specs/symbolic/engine/DFAeqSDFA.scala) — and that is
  * exactly how ClassicalSpec uses it here.
  */
sealed trait RegExpTree
object RegExpTree {
  final case class Sym(c: String) extends RegExpTree
  final case class Concat(ts: List[RegExpTree]) extends RegExpTree
  final case class Union(ts: List[RegExpTree]) extends RegExpTree
  final case class Star(t: RegExpTree) extends RegExpTree
}

final case class ClassicalDfa(
    alphabet: Vector[String],
    delta: Array[Array[Int]], // state × symbol → state (total)
    start: Int,
    finals: Set[Int]) {

  private val symIdx = alphabet.zipWithIndex.toMap

  def accepts(word: Seq[String]): Boolean = {
    var s = start
    word.foreach { c => s = delta(s)(symIdx(c)) }
    finals.contains(s)
  }
}

object Classical {

  private final case class Nfa(
      trans: List[(Int, Option[String], Int)], start: Int, fin: Int, nStates: Int)

  /** Thompson construction over the character alphabet. */
  private def thompson(t: RegExpTree, next: () => Int): Nfa = t match {
    case RegExpTree.Sym(c) =>
      val a = next(); val b = next()
      Nfa(List((a, Some(c), b)), a, b, 2)
    case RegExpTree.Concat(ts) =>
      ts.map(thompson(_, next)).reduceLeft { (l, r) =>
        Nfa(l.trans ::: ((l.fin, None, r.start) :: r.trans), l.start, r.fin, l.nStates + r.nStates)
      }
    case RegExpTree.Union(ts) =>
      val subs = ts.map(thompson(_, next))
      val s = next(); val f = next()
      Nfa(
        subs.flatMap(x => (s, None, x.start) :: (x.fin, None, f) :: x.trans),
        s, f, subs.map(_.nStates).sum + 2)
    case RegExpTree.Star(x) =>
      val sub = thompson(x, next)
      val s = next(); val f = next()
      Nfa(
        (s, None, sub.start) :: (s, None, f) :: (sub.fin, None, sub.start) ::
          (sub.fin, None, f) :: sub.trans,
        s, f, sub.nStates + 2)
  }

  /** regexp → NFA → DFA via ε-closure subset construction; completed with
    * an implicit dead state (the empty subset).
    */
  def compile(t: RegExpTree, alphabet: Seq[String]): ClassicalDfa = {
    var counter = -1
    val nfa = thompson(t, () => { counter += 1; counter })
    val eps = nfa.trans.collect { case (a, None, b) => a -> b }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }.withDefaultValue(Nil)
    val bySym = nfa.trans.collect { case (a, Some(c), b) => (a, c) -> b }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }.withDefaultValue(Nil)

    def closure(s: Set[Int]): Set[Int] = {
      var cur = s
      var grew = true
      while (grew) {
        val nxt = cur ++ cur.flatMap(eps)
        grew = nxt.size != cur.size
        cur = nxt
      }
      cur
    }

    val alpha = alphabet.toVector
    val subsets = mutable.LinkedHashMap[Set[Int], Int]()
    def idOf(s: Set[Int]): Int = subsets.getOrElseUpdate(s, subsets.size)
    val startSet = closure(Set(nfa.start))
    idOf(startSet)
    val queue = mutable.Queue(startSet)
    val rows = mutable.ArrayBuffer.empty[Array[Int]]
    while (queue.nonEmpty) {
      val cur = queue.dequeue()
      val row = alpha.map { c =>
        val tgt = closure(cur.flatMap(q => bySym((q, c))))
        val before = subsets.size
        val id = idOf(tgt)
        if (subsets.size != before) queue += tgt
        id
      }.toArray
      rows += row
    }
    val finals = subsets.collect { case (set, id) if set.contains(nfa.fin) => id }.toSet
    ClassicalDfa(alpha, rows.toArray, 0, finals)
  }

  /** The classical tree as an SRE formula over IsEventType predicates —
    * the bridge both engines compile the same pattern through. */
  def toSre(t: RegExpTree): Sre = t match {
    case RegExpTree.Sym(c)     => Sre.Sent(Sentence.Atomic(Predicate.IsEventType(c)))
    case RegExpTree.Concat(ts) => Sre.Op(RegOp.SEQ, ts.map(toSre))
    case RegExpTree.Union(ts)  => Sre.Op(RegOp.CHOICE, ts.map(toSre))
    case RegExpTree.Star(x)    => Sre.Op(RegOp.ITER, List(toSre(x)))
  }
}
