package graft.cef

import scala.collection.mutable

/** C10: deterministic streaming runtime for count-windowed register (SREMO)
  * patterns — the DSRA path.
  *
  * The reference makes register patterns forecastable by unrolling the NSRA
  * over the window and determinizing to a DSRA, then running WINDOW
  * staggered copies of it whose per-copy state forms a hyper-state
  * (fsm/symbolic/sra/nsra/NSRAUtils.scala:1-637,
  * dsra/DSRAStreaming.scala:58-315): copy w restarts at stream positions
  * ≡ w (mod window), so every window-aligned block is owned by exactly one
  * copy and any match whose span fits the window lies inside some copy's
  * current block.
  *
  * This runtime keeps the same staggered-copies shape but performs the
  * determinization LAZILY: each copy holds the set of reachable
  * (state, valuation) configurations, advanced as a pure function of the
  * event — the execution strategy symbolic-automata determinization uses
  * when the alphabet is infinite (and what the reference's Configuration
  * objects carry at runtime, DSRAStreaming.scala:115-236). Unlike the
  * enumeration runtime there are no per-match threads: the configuration
  * population is bounded by |Q| × (window+1)^registers per copy regardless
  * of how many matches overlap, which is what makes the path deterministic
  * and forecast-ready.
  *
  * Supported class: the surface language's windowed SREMO patterns (whose
  * only non-TAKE transitions are self-loops). [[graft.cef.spark.Detect.
  * detectionsDsra]] runs it per key; DsraSpec pins detection-point
  * equivalence against the enumeration runtime.
  */
final class DsraRun(cp: CompiledPattern, val partition: String) extends Serializable {
  require(cp.window > 0 && cp.windowKind == WindowKind.Count,
    "the DSRA path needs a count window — unwindowed register patterns are not determinizable " +
      "(reference DSRAStreaming unrolls over the window)")
  // Enforce the documented supported class rather than silently missing
  // matches: the block-ownership argument needs every consumed event of a
  // match inside one window. The window is measured from the first TAKE,
  // so post-take IGNORE advances (skip-till-any's skip region) are fine;
  // what breaks it is an IGNORE transition that ADVANCES state while still
  // pre-take (reachable from start through IGNOREs only) — the match would
  // consume events before its window starts. The surface language's
  // windowed SREMO patterns have none; complement-compiled IGNORE chains
  // at the pattern head do.
  require({
    val nfa0 = cp.snfa
    var preTake = Set(nfa0.start)
    var grew = true
    while (grew) {
      val nxt = preTake ++ nfa0.trans.collect {
        case t if !t.take && preTake.contains(t.src) => t.dst
      }
      grew = nxt.size != preTake.size
      preTake = nxt
    }
    nfa0.trans.forall(t => t.take || !preTake.contains(t.src) || t.src == t.dst)
  }, "pattern has pre-take state-advancing IGNORE transitions — its consumed span can " +
    "exceed the window measured from the first TAKE; use the match-enumeration runtime")

  private val W = cp.window.toInt
  private val nfa = cp.snfa
  private var counter = 0L

  // register names in a fixed order, known at construction: config keys
  // list ids in THIS order — no per-candidate sorting on the hot path
  private val regNames: Array[String] =
    nfa.trans.flatMap(_.register).distinct.sorted.toArray

  /** One deterministic configuration: NSRA state, concrete registers, and
    * whether the run has consumed a TAKE event (final + taken = a match).
    */
  private final case class Config(state: Int, valuation: Map[String, CEvent], taken: Boolean)
  // key = (state, bound-register bitmask, ids in fixed order, taken): the
  // mask distinguishes an UNBOUND register from any bound event id (ids
  // come from user data and may legitimately be any long, including the
  // 0L placeholder used for unbound slots)
  private type Key = (Int, Int, List[Long], Boolean)
  private def keyOf(c: Config): Key = {
    var ids = List.empty[Long]
    var mask = 0
    var i = regNames.length - 1
    while (i >= 0) {
      c.valuation.get(regNames(i)) match {
        case Some(e) => mask |= 1 << i; ids = e.id :: ids
        case None    => ids = 0L :: ids
      }
      i -= 1
    }
    (c.state, mask, ids, c.taken)
  }

  private val startConfig = Config(nfa.start, Map.empty, taken = false)
  private val copies: Array[mutable.LinkedHashMap[Key, Config]] =
    Array.fill(W)(mutable.LinkedHashMap.empty)
  // double-buffered work map per copy: cleared and swapped each step
  // instead of allocating a fresh map per copy per event
  private val work: Array[mutable.LinkedHashMap[Key, Config]] =
    Array.fill(W)(mutable.LinkedHashMap.empty)

  /** Total live configurations across copies (boundedness is asserted in
    * DsraSpec: ≤ |Q| × (window+1)^registers per copy). */
  def activeConfigs: Int = copies.map(_.size).sum

  def reset(): Unit = copies.foreach(_.clear())

  /** Snapshot/restore for streaming GroupState (the hyper-state +
    * valuations, reference DSRAStreaming Configuration payloads). */
  def snapshot: DsraRunState =
    DsraRunState(counter, copies.zipWithIndex.toSeq.flatMap { case (m, w) =>
      m.values.map(c => DsraConfigState(w, c.state, c.valuation, c.taken))
    })

  def restore(s: DsraRunState): Unit = {
    counter = s.counter
    reset()
    s.configs.foreach { cs =>
      val c = Config(cs.state, cs.registers, cs.taken)
      copies(cs.copy).update(keyOf(c), c)
    }
  }

  /** Process one event; a detection marks that ≥1 window-bounded match
    * completes AT this event (the deterministic runtime reports completion
    * points, not match enumerations — exactly like the SDFA path's DetRun).
    */
  def step(e: CEvent): Option[Detection] = {
    if (e.isReset) { reset(); return None }
    counter += 1
    var detected: Option[Detection] = None
    var w = 0
    while (w < W) {
      val copy = copies(w)
      if ((counter - 1) % W == w) copy.clear() // block boundary: fresh start
      val next = work(w)
      next.clear()
      def advance(c: Config): Unit =
        nfa.bySrc(c.state).foreach { t =>
          if (nfa.coReachable.contains(t.dst) && t.guard.exists(_.eval(e, c.valuation))) {
            val nv = t.register match {
              case Some(r) => c.valuation.updated(r, e)
              case None    => c.valuation
            }
            val nc = Config(t.dst, nv, c.taken || t.take)
            val k = keyOf(nc)
            if (!next.contains(k)) {
              next(k) = nc
              if (detected.isEmpty && nfa.finals.contains(nc.state) && nc.taken)
                detected = Some(Detection(partition, counter, e.id, e.timestamp, nc.state))
            }
          }
        }
      advance(startConfig)
      copy.valuesIterator.foreach(advance)
      // swap the buffers: next becomes the live set, the old live set is
      // the next step's (cleared) work map
      copies(w) = next
      work(w) = copy
      w += 1
    }
    detected
  }
}

/** One serialized DSRA configuration (copy index + state + registers). */
final case class DsraConfigState(
    copy: Int, state: Int, registers: Map[String, CEvent], taken: Boolean)

/** Serializable snapshot of a [[DsraRun]] — the streaming GroupState payload. */
final case class DsraRunState(counter: Long, configs: Seq[DsraConfigState])
