package graft.cef

/** Symbolic-regular-expression AST, parser, and selection-strategy rewrite.
  *
  * The language is the reference's SRE prefix notation
  * (Wayeb/docs/lang.md; parser Wayeb/cef/src/main/scala/fsm/symbolic/sre/
  * SREParser.scala:106-284):
  *
  *   - regular ops  `;` (sequence)  `+` (choice)  `*` (iteration)  `!` (negation)
  *   - selection    `#` (skip-till-any)  `@` (skip-till-next), unary wrappers
  *   - logic ops    `^` (and)  `|` (or)  `-` (not) over predicates
  *   - per-pattern flags `{order:N} {partitionBy:attr} {window:N} {windowType:count|time}`
  *   - multiple patterns separated by `&`
  *
  * Example: `;(IsEventTypePredicate(A),+(IsEventTypePredicate(B),IsEventTypePredicate(C))){order:2}`
  */
sealed trait Sre extends Product with Serializable
object Sre {
  /** A guard sentence; `marked` decides TAKE vs IGNORE on the transition
    * (events of unmarked sentences are not added to the match); `register`
    * is the SREMO register the matching event is stored into
    * (docs/lang.md §SREMO — `IsEventTypePredicate(A)["x"]`). */
  final case class Sent(s: Sentence, marked: Boolean = true, register: Option[String] = None) extends Sre
  /** The empty word. */
  case object Eps extends Sre
  final case class Op(op: RegOp, args: List[Sre]) extends Sre
}

sealed trait RegOp
object RegOp {
  case object SEQ extends RegOp
  case object CHOICE extends RegOp
  case object ITER extends RegOp
  case object NEG extends RegOp
  /** skip-till-any wrapper (`#`), eliminated by [[Selection.rewrite]]. */
  case object ANY extends RegOp
  /** skip-till-next wrapper (`@`), eliminated by [[Selection.rewrite]]. */
  case object NEXT extends RegOp
}

sealed trait WindowKind
object WindowKind {
  case object Count extends WindowKind
  case object Time extends WindowKind
}

/** One parsed pattern with its flags. window == 0 means unwindowed. */
final case class Pattern(
    formula: Sre,
    order: Int = 0,
    partitionBy: Option[String] = None,
    window: Long = 0L,
    windowKind: WindowKind = WindowKind.Count)

object SreParser {

  /** Parse a pattern file body: one or more patterns separated by `&`. */
  def parseAll(text: String): List[Pattern] =
    text.split('&').map(_.trim).filter(_.nonEmpty).map(parsePattern).toList

  def parsePattern(text: String): Pattern = {
    val p = new P(text.trim)
    val f = p.formula()
    var pat = Pattern(f)
    while (p.peek == Some('{')) {
      val (k, v) = p.flag()
      k match {
        case "order"       => pat = pat.copy(order = v.toInt)
        case "partitionBy" => pat = pat.copy(partitionBy = Some(v))
        case "window"      => pat = pat.copy(window = v.toLong)
        case "windowType"  => pat = pat.copy(windowKind =
          if (v == "time") WindowKind.Time else WindowKind.Count)
        case other => throw new IllegalArgumentException(s"unknown flag '$other'")
      }
    }
    p.end()
    pat
  }

  /** Parse declarations: `+(P1,P2)` extras add predicates to the minterm
    * alphabet; `~(P1,P2)` marks predicates mutually exclusive
    * (reference DeclarationsParser; semantics docs/lang.md §Declarations).
    * Returns (extras, exclusives).
    */
  def parseDeclarations(text: String): (Set[Predicate], Set[Set[Predicate]]) = {
    var extras = Set.empty[Predicate]
    var excl = Set.empty[Set[Predicate]]
    text.split('&').map(_.trim).filter(_.nonEmpty).foreach { d =>
      val p = new P(d)
      val c = p.next()
      val preds = p.predList()
      c match {
        case '+' => extras ++= preds
        case '~' => excl += preds.toSet
        case o   => throw new IllegalArgumentException(s"bad declaration op '$o'")
      }
      p.end()
    }
    (extras, excl)
  }

  /** Hand-written recursive-descent parser over the prefix syntax. */
  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def peek: Option[Char] = { ws(); if (i < s.length) Some(s(i)) else None }
    def next(): Char = {
      ws()
      if (i >= s.length) fail("unexpected end of input")
      val c = s(i); i += 1; c
    }
    private def expect(c: Char): Unit = {
      val g = next()
      if (g != c) fail(s"expected '$c', got '$g'")
    }
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"SRE parse error at $i in '$s': $msg")
    def end(): Unit = { ws(); if (i < s.length) fail("trailing input") }

    def formula(): Sre = peek match {
      case Some(c) if ";+*!#@".contains(c) =>
        i += 1
        val op = c match {
          case ';' => RegOp.SEQ
          case '+' => RegOp.CHOICE
          case '*' => RegOp.ITER
          case '!' => RegOp.NEG
          case '#' => RegOp.ANY
          case '@' => RegOp.NEXT
        }
        val args = argList(() => formula())
        (op, args.size) match {
          case (RegOp.ITER | RegOp.NEG | RegOp.ANY | RegOp.NEXT, n) if n != 1 =>
            fail(s"$op takes exactly one argument, got $n")
          case _ => Sre.Op(op, args)
        }
      case _ =>
        val snt = sentence()
        // optional SREMO register declaration: ["x"]
        if (peek == Some('[')) {
          i += 1
          ws()
          expect('"')
          val start = i
          while (i < s.length && s(i) != '"') i += 1
          val reg = s.substring(start, i)
          expect('"'); expect(']')
          Sre.Sent(snt, register = Some(reg))
        } else Sre.Sent(snt)
    }

    def sentence(): Sentence = peek match {
      case Some('^') => i += 1; Sentence.And(argList(() => sentence()))
      case Some('|') => i += 1; Sentence.Or(argList(() => sentence()))
      case Some('-') => i += 1; Sentence.Not(argList(() => sentence()) match {
        case List(one) => one
        case many      => fail(s"- takes exactly one argument, got ${many.size}")
      })
      case _ => Sentence.Atomic(predicate())
    }

    def predicate(): Predicate = {
      val name = ident()
      val args = if (peek == Some('(')) argList(() => term()) else Nil
      Predicate.fromName(name, args)
    }

    def predList(): List[Predicate] = argList(() => predicate())

    private def argList[A](one: () => A): List[A] = {
      expect('(')
      val buf = List.newBuilder[A]
      buf += one()
      while (peek == Some(',')) { i += 1; buf += one() }
      expect(')')
      buf.result()
    }

    private def ident(): String = {
      ws()
      val start = i
      while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
      if (i == start) fail("expected identifier")
      s.substring(start, i)
    }

    /** A predicate argument: identifier, number, or quoted string. */
    private def term(): String = {
      ws()
      peek match {
        case Some('"') =>
          i += 1
          val start = i
          while (i < s.length && s(i) != '"') i += 1
          val t = s.substring(start, i); expect('"'); t
        case Some(c) if c == '-' || c.isDigit =>
          val start = i
          i += 1
          while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
          s.substring(start, i)
        case _ => ident()
      }
    }

    def flag(): (String, String) = {
      expect('{')
      val k = ident()
      expect(':')
      ws()
      val start = i
      while (i < s.length && s(i) != '}') i += 1
      val v = s.substring(start, i).trim
      expect('}')
      (k, v)
    }
  }
}

/** Selection-strategy elimination — formula→formula rewrite
  * (reference fsm/symbolic/sre/SelectionUtils.scala:15-291):
  *
  *   any(R1;R2)  → R1 ; T* ; R2
  *   next(R1;R2) → R1 ; !(T* ; R2 ; T*) ; R2
  *   any(R*)     → (R ; (T* ; R)*) + ε
  *   next(R*)    → (R ; (!(T* ; R ; T*) ; R)*) + ε
  *
  * Interleaved T* sentences are unmarked (IGNORE): skipped events do not
  * enter the match. Strategies have no effect on disjunction/negation
  * (docs/lang.md §SRE).
  */
object Selection {
  import RegOp._
  import Sre._

  private sealed trait Strat
  private case object Strict extends Strat
  private case object Any extends Strat
  private case object Next extends Strat

  private val TStar: Sre = Op(ITER, List(Sent(Sentence.True, marked = false)))

  def rewrite(f: Sre): Sre = go(f, Strict)

  private def go(f: Sre, st: Strat): Sre = f match {
    case s: Sent => s
    case Eps     => Eps
    case Op(ANY, List(g))  => go(g, Any)
    case Op(NEXT, List(g)) => go(g, Next)
    case Op(SEQ, args) =>
      val as = args.map(go(_, st))
      st match {
        case Strict => Op(SEQ, as)
        case Any =>
          as.reduceLeft((acc, a) => Op(SEQ, List(acc, TStar, a)))
        case Next =>
          as.reduceLeft((acc, a) =>
            Op(SEQ, List(acc, notContaining(a), a)))
      }
    case Op(CHOICE, args) => Op(CHOICE, args.map(go(_, st)))
    case Op(ITER, List(g)) =>
      val r = go(g, st)
      st match {
        case Strict => Op(ITER, List(r))
        case Any =>
          Op(CHOICE, List(Op(SEQ, List(r, Op(ITER, List(Op(SEQ, List(TStar, r)))))), Eps))
        case Next =>
          Op(CHOICE, List(
            Op(SEQ, List(r, Op(ITER, List(Op(SEQ, List(notContaining(r), r)))))), Eps))
      }
    case Op(NEG, List(g)) => Op(NEG, List(go(g, st)))
    case Op(op, args) =>
      throw new IllegalArgumentException(s"malformed $op with ${args.size} args")
  }

  /** !(T* ; R ; T*) — the "no occurrence of R strictly inside" gap filler. */
  private def notContaining(r: Sre): Sre =
    Op(NEG, List(Op(SEQ, List(TStar, r, TStar))))
}
