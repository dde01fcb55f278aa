package graft.cef

import scala.collection.mutable

/** C8: disambiguation to order m (reference fsm/symbolic/sfa/sdfa/
  * Disambiguator.scala:1-367, after Nuel 2008 Algorithm 1).
  *
  * A full-order-m Markov chain can only embed on an SDFA's states if the
  * automaton is m-unambiguous: every state reachable by a word of length
  * ≥ m uniquely determines the last m symbols read. The construction
  * refines each state with its symbol-suffix history — new states are the
  * REACHABLE pairs (q, w) with w ∈ Σ^{≤m} the last min(len, m) symbols, and
  *
  *     (q, w) --σ--> (δ(q,σ), suffix_m(w·σ))
  *
  * This is language-equivalent by construction (the first component runs
  * the original delta) and m-unambiguous by construction (the second
  * component IS the last-m window). The reference's implementation splits
  * lazily to keep the automaton minimal; we build the reachable product,
  * which is semantically identical — the state count is bounded by
  * |Q|·|Σ|^m and only reachable pairs materialize.
  */
object Disambiguator {

  /** Result: the refined SDFA plus the projection back to original states
    * (for interpreting detections) and each state's determined suffix.
    */
  final case class Disambiguated(
      sdfa: Sdfa,
      projection: Vector[Int],
      suffix: Vector[List[Int]])

  def disambiguate(sdfa: Sdfa, m: Int): Disambiguated = {
    if (m <= 0)
      return Disambiguated(sdfa,
        Vector.tabulate(sdfa.nStates)(identity),
        Vector.fill(sdfa.nStates)(Nil))

    val k = sdfa.iso.size
    // (origState, window oldest-first) → new id, discovered BFS order
    val index = mutable.LinkedHashMap.empty[(Int, List[Int]), Int]
    def idOf(s: (Int, List[Int])): Int = index.getOrElseUpdate(s, index.size)

    val start = (sdfa.start, List.empty[Int])
    idOf(start)
    val queue = mutable.Queue(start)
    val deltaRows = mutable.ArrayBuffer.empty[Array[Int]]
    val takeRows = mutable.ArrayBuffer.empty[Array[Boolean]]

    while (queue.nonEmpty) {
      val cur @ (q, w) = queue.dequeue()
      val row = new Array[Int](k)
      val takeRow = new Array[Boolean](k)
      var sym = 0
      while (sym < k) {
        val nq = sdfa.delta(q)(sym)
        val nw = (w :+ sym).takeRight(m)
        val target = (nq, nw)
        val before = index.size
        val id = idOf(target)
        if (index.size != before) queue += target
        row(sym) = id
        takeRow(sym) = sdfa.takes(q)(sym)
        sym += 1
      }
      deltaRows += row
      takeRows += takeRow
    }

    val states = index.keys.toVector
    val finals = states.zipWithIndex.collect {
      case ((q, _), i) if sdfa.finals.contains(q) => i
    }.toSet
    Disambiguated(
      Sdfa(deltaRows.toArray, takeRows.toArray, 0, finals, sdfa.iso),
      states.map(_._1),
      states.map(_._2))
  }
}
