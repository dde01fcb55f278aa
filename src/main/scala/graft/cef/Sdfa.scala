package graft.cef

import scala.collection.mutable

/** Deterministic symbolic finite automaton over the minterm alphabet.
  *
  * `delta(state)(symbol)` is total (subset construction with the empty set as
  * an explicit dead state), so every event moves every run — the property the
  * Markov-chain embedding needs. `takes(state)(symbol)` is true when any
  * contributing SNFA transition was TAKE (match membership under
  * determinization, reference fsm/symbolic/sfa/Determinizer.scala:23-230).
  */
final case class Sdfa(
    delta: Array[Array[Int]],
    takes: Array[Array[Boolean]],
    start: Int,
    finals: Set[Int],
    iso: Isomorphism) {

  def nStates: Int = delta.length
  def isFinal(s: Int): Boolean = finals.contains(s)

  def next(state: Int, symbol: Int): Int =
    if (symbol < 0) state else delta(state)(symbol)

  def accepts(word: Seq[CEvent]): Boolean = {
    var s = start
    word.foreach { e => s = next(s, iso.evaluate(e)) }
    isFinal(s)
  }

  /** F8: shortest transition distance from each state to any final state
    * (BFS on the reversed delta graph; unreachable → -1), and the derived
    * remaining percentage dist/maxDist used for distance-gated forecast
    * emission (reference fsm/FSMInterface.scala:200-316,
    * SPSTInterface.scala:251-258).
    */
  lazy val shortestPathToFinal: Array[Int] = {
    val dist = Array.fill(nStates)(-1)
    val preds = Array.fill(nStates)(List.empty[Int])
    for (s <- 0 until nStates; m <- delta(s).indices) preds(delta(s)(m)) ::= s
    val queue = scala.collection.mutable.Queue.empty[Int]
    finals.foreach { f => dist(f) = 0; queue += f }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      preds(s).foreach { p =>
        if (dist(p) == -1) { dist(p) = dist(s) + 1; queue += p }
      }
    }
    dist
  }

  /** remaining percentage ∈ [0,1]: 0 at finals, 1 at the farthest states;
    * -1 for states that cannot reach a final. */
  lazy val remainingPercentage: Array[Double] = {
    val d = shortestPathToFinal
    val maxD = d.max
    d.map(x => if (x < 0) -1.0 else if (maxD == 0) 0.0 else x.toDouble / maxD)
  }
}

object Sdfa {

  /** Subset construction over the assignment alphabet. The input SNFA must be
    * ε-free. A transition applies under symbol m iff its guard evaluates true
    * under m's truth assignment — this uniformly covers atomic guards and the
    * complex OR-of-assignment guards produced by complement.
    */
  def determinize(n: Snfa, iso: Isomorphism): Sdfa = {
    val k = iso.size
    // pre-evaluate every distinct guard under every symbol
    val guards = n.guardSentences.toVector
    val guardIdx = guards.zipWithIndex.toMap
    val sat = Array.tabulate(guards.size, k)((g, m) => guards(g).evalUnder(iso.minterms(m)))

    val subsets = mutable.LinkedHashMap[Set[Int], Int]()
    def stateOf(s: Set[Int]): Int = subsets.getOrElseUpdate(s, subsets.size)

    val deltaBuf = mutable.ArrayBuffer[Array[Int]]()
    val takeBuf = mutable.ArrayBuffer[Array[Boolean]]()
    val queue = mutable.Queue[Set[Int]]()
    val startSet = Set(n.start)
    stateOf(startSet)
    queue += startSet

    while (queue.nonEmpty) {
      val cur = queue.dequeue()
      val row = new Array[Int](k)
      val takeRow = new Array[Boolean](k)
      val outs = cur.toList.flatMap(n.bySrc)
      var m = 0
      while (m < k) {
        var targets = Set.empty[Int]
        var take = false
        outs.foreach { t =>
          if (sat(guardIdx(t.guard.get))(m)) {
            targets += t.dst
            if (t.take) take = true
          }
        }
        val before = subsets.size
        val id = stateOf(targets)
        if (subsets.size != before) queue += targets
        row(m) = id
        takeRow(m) = take && targets.nonEmpty
        m += 1
      }
      deltaBuf += row
      takeBuf += takeRow
    }

    val finals = subsets.collect {
      case (set, id) if set.exists(n.finals.contains) => id
    }.toSet
    Sdfa(deltaBuf.toArray, takeBuf.toArray, 0, finals, iso)
  }
}
