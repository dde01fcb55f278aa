package graft.cef

/** Nondeterministic symbolic finite automaton.
  *
  * Guards are [[Sentence]]s (None = ε). `take` decides whether the event
  * triggering the transition joins the match (TAKE) or not (IGNORE) —
  * reference TransitionOutput, fsm/symbolic/sfa/snfa/SNFAUtils.scala:159.
  * `register` stores the triggering event into the named SREMO register
  * (reference NSRA write registers, fsm/symbolic/sra).
  */
final case class NTrans(
    src: Int, dst: Int, guard: Option[Sentence], take: Boolean,
    register: Option[String] = None)

final case class Snfa(
    states: Set[Int],
    trans: List[NTrans],
    start: Int,
    finals: Set[Int]) {

  lazy val bySrc: Map[Int, List[NTrans]] = trans.groupBy(_.src).withDefaultValue(Nil)

  /** States from which some final state is reachable — runtimes drop dead
    * configurations (the reference kills dead runs, ERFEngine.scala:300-305).
    */
  lazy val coReachable: Set[Int] = {
    val byDst = trans.groupBy(_.dst).withDefaultValue(Nil)
    var reach = finals
    var grew = true
    while (grew) {
      val nxt = reach ++ reach.flatMap(s => byDst(s).map(_.src))
      grew = nxt.size != reach.size
      reach = nxt
    }
    reach
  }

  def guardSentences: Set[Sentence] = trans.flatMap(_.guard).toSet
  def predicates: Set[Predicate] = guardSentences.flatMap(_.predicates)

  /** Language membership over a word of events — spec-level, used by the
    * randomized equivalence tests (reference style:
    * Specs/symbolic/snfa specs check `accepts` against formula semantics).
    */
  def accepts(word: Seq[CEvent]): Boolean = {
    def eclose(s: Set[Int]): Set[Int] = {
      var cur = s
      var grew = true
      while (grew) {
        val nxt = cur ++ cur.flatMap(u => bySrc(u).collect {
          case t if t.guard.isEmpty => t.dst
        })
        grew = nxt.size != cur.size
        cur = nxt
      }
      cur
    }
    var cur = eclose(Set(start))
    word.foreach { e =>
      cur = eclose(cur.flatMap(u => bySrc(u).collect {
        case t if t.guard.exists(_.eval(e)) => t.dst
      }))
    }
    cur.exists(finals.contains)
  }
}

/** Thompson-style SNFA construction from a (selection-rewritten) SRE formula
  * (reference fsm/symbolic/sfa/snfa/SNFAUtils.scala:52-380). Negation is
  * compiled by determinizing the sub-automaton over its own predicate
  * assignments, completing it, and swapping finals — all complement
  * transitions become IGNORE (SNFAUtils.scala:327).
  */
object Thompson {

  private final class IdGen { private var n = -1; def next(): Int = { n += 1; n } }

  /** @param exclusives mutually-exclusive predicate sets; needed when
    *                    determinizing NEG sub-automata. */
  def build(f: Sre, exclusives: Set[Set[Predicate]]): Snfa = {
    val idg = new IdGen
    go(f, idg, exclusives)
  }

  private def go(f: Sre, idg: IdGen, excl: Set[Set[Predicate]]): Snfa = f match {
    case Sre.Sent(s, marked, register) =>
      val a = idg.next(); val b = idg.next()
      Snfa(Set(a, b), List(NTrans(a, b, Some(s), marked, register)), a, Set(b))

    case Sre.Eps =>
      val a = idg.next(); val b = idg.next()
      Snfa(Set(a, b), List(NTrans(a, b, None, take = false)), a, Set(b))

    case Sre.Op(RegOp.SEQ, args) =>
      args.map(go(_, idg, excl)).reduceLeft { (l, r) =>
        val bridge = l.finals.toList.map(fs => NTrans(fs, r.start, None, take = false))
        Snfa(l.states ++ r.states, l.trans ::: bridge ::: r.trans, l.start, r.finals)
      }

    case Sre.Op(RegOp.CHOICE, args) =>
      val subs = args.map(go(_, idg, excl))
      val s = idg.next(); val t = idg.next()
      val inEdges = subs.map(x => NTrans(s, x.start, None, take = false))
      val outEdges = subs.flatMap(x => x.finals.toList.map(fs => NTrans(fs, t, None, take = false)))
      Snfa(subs.flatMap(_.states).toSet + s + t,
        inEdges ::: outEdges ::: subs.flatMap(_.trans), s, Set(t))

    case Sre.Op(RegOp.ITER, List(g)) =>
      val x = go(g, idg, excl)
      val s = idg.next(); val t = idg.next()
      val edges =
        NTrans(s, x.start, None, take = false) ::
        NTrans(s, t, None, take = false) ::
        x.finals.toList.flatMap(fs => List(
          NTrans(fs, x.start, None, take = false),
          NTrans(fs, t, None, take = false)))
      Snfa(x.states + s + t, edges ::: x.trans, s, Set(t))

    case Sre.Op(RegOp.NEG, List(g)) =>
      val sub = eliminateEpsilon(go(g, idg, excl))
      val iso = Isomorphism.build(sub.predicates + Predicate.True, excl)
      val dfa = Sdfa.determinize(sub, iso)
      // DFA → NFA with sentence guards: one guard per (src,dst) as the OR of
      // its symbols' assignment conjunctions; finals swapped; all IGNORE.
      val base = idg.next() // offset so ids stay unique within the parent
      val grouped = (0 until dfa.nStates).flatMap { s =>
        (0 until iso.size).map(m => (s, dfa.delta(s)(m)) -> m)
      }.groupBy(_._1).map { case ((s, d), ms) =>
        val guard = Sentence.Or(ms.map(x => iso.sentenceOf(x._2)).toList)
        NTrans(base + s, base + d, Some(guard), take = false)
      }.toList
      for (_ <- 1 until dfa.nStates) idg.next() // reserve the id range
      val states = (0 until dfa.nStates).map(base + _).toSet
      val finals = (0 until dfa.nStates).filterNot(dfa.finals.contains).map(base + _).toSet
      Snfa(states, grouped, base + dfa.start, finals)

    case other =>
      throw new IllegalArgumentException(s"cannot build SNFA from $other")
  }

  /** ε-elimination (reference SNFAUtils.eliminateEpsilon / Eliminator):
    * fold each state's ε-closure into direct transitions, recompute finals,
    * drop unreachable states.
    */
  def eliminateEpsilon(n: Snfa): Snfa = {
    val closures: Map[Int, Set[Int]] = n.states.map { s =>
      var cur = Set(s)
      var grew = true
      while (grew) {
        val nxt = cur ++ cur.flatMap(u => n.bySrc(u).collect { case t if t.guard.isEmpty => t.dst })
        grew = nxt.size != cur.size
        cur = nxt
      }
      s -> cur
    }.toMap
    val newTrans = n.states.toList.flatMap { u =>
      closures(u).toList.flatMap(v => n.bySrc(v).collect {
        case t if t.guard.isDefined => NTrans(u, t.dst, t.guard, t.take, t.register)
      })
    }.distinct
    val newFinals = n.states.filter(u => closures(u).exists(n.finals.contains))
    // reachability from start over the new transitions
    val bySrc = newTrans.groupBy(_.src).withDefaultValue(Nil)
    var reach = Set(n.start)
    var grew = true
    while (grew) {
      val nxt = reach ++ reach.flatMap(u => bySrc(u).map(_.dst))
      grew = nxt.size != reach.size
      reach = nxt
    }
    Snfa(reach, newTrans.filter(t => reach(t.src) && reach(t.dst)),
      n.start, newFinals.intersect(reach))
  }

  /** Streaming variant: prefix the automaton with an IGNORE TRUE self-loop so
    * detection can start at any stream position (reference
    * SNFAUtils.buildSNFAForStream / addInitialSelfLoop:75-95). Input must be
    * ε-free; the ε start→start edge of the reference is folded directly.
    */
  def streaming(n: Snfa): Snfa = {
    val q = (n.states.max) + 1
    val loop = NTrans(q, q, Some(Sentence.True), take = false)
    // ε from q to old start, pre-eliminated: copy start's out-edges onto q
    val copied = n.bySrc(n.start).map(t => NTrans(q, t.dst, t.guard, t.take, t.register))
    val finals = if (n.finals(n.start)) n.finals + q else n.finals
    Snfa(n.states + q, loop :: copied ::: n.trans, q, finals)
  }
}
