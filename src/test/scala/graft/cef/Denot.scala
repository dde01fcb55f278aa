package graft.cef

/** Denotational (spec-level) semantics of SRE formulas: does a whole word
  * match the formula? Used as the independent oracle for the randomized
  * automaton-equivalence specs — the reference tests the same way, checking
  * automaton `accepts` against formula semantics over all short words
  * (Specs/symbolic/snfa, utils/testing/SymbolWordGenerator.scala:1-251).
  *
  * Deliberately naive (exponential split enumeration) — correctness only.
  */
object Denot {

  def matches(f: Sre, w: List[CEvent]): Boolean = f match {
    case Sre.Sent(s, _, _) => w.lengthCompare(1) == 0 && s.eval(w.head)
    case Sre.Eps        => w.isEmpty
    case Sre.Op(RegOp.SEQ, args) => seqMatch(args, w)
    case Sre.Op(RegOp.CHOICE, args) => args.exists(matches(_, w))
    case Sre.Op(RegOp.ITER, List(g)) => iterMatch(g, w)
    case Sre.Op(RegOp.NEG, List(g)) => !matches(g, w)
    case other => throw new IllegalArgumentException(s"unsupported in Denot: $other")
  }

  private def seqMatch(args: List[Sre], w: List[CEvent]): Boolean = args match {
    case Nil      => w.isEmpty
    case f :: Nil => matches(f, w)
    case f :: rest =>
      (0 to w.length).exists { i =>
        val (pre, post) = w.splitAt(i)
        matches(f, pre) && seqMatch(rest, post)
      }
  }

  private def iterMatch(g: Sre, w: List[CEvent]): Boolean =
    w.isEmpty || (1 to w.length).exists { i =>
      val (pre, post) = w.splitAt(i)
      matches(g, pre) && iterMatch(g, post)
    }

  /** Streaming acceptance: some suffix of the word matches the formula. */
  def matchesSuffix(f: Sre, w: List[CEvent]): Boolean =
    w.indices.exists(i => matches(f, w.drop(i))) || matches(f, Nil)
}
