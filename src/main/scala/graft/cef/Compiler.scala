package graft.cef

/** End-to-end pattern compilation: SRE text → selection rewrite → SNFA →
  * ε-elimination → minterm alphabet → streaming SDFA.
  *
  * This is the plan-time "query compiler" of the engine (reference pipeline
  * traced in SURVEY.md §3.2: SREParser → SelectionUtils → SNFAUtils →
  * LogicUtils minterms → Determinizer). It runs on the driver; the compiled
  * automaton is a small immutable value that ships to executors inside the
  * task closure (the Spark analogue of the reference broadcasting its model
  * to keyed Flink instances).
  */
final case class CompiledPattern(
    pattern: Pattern,
    /** ε-free non-streaming SNFA — match-enumeration runtime. */
    snfa: Snfa,
    /** streaming SDFA (TRUE* prefix) — detection/forecasting runtime. */
    sdfa: Sdfa) {
  def iso: Isomorphism = sdfa.iso
  def window: Long = pattern.window
  def windowKind: WindowKind = pattern.windowKind
}

object Compiler {

  def compile(patternText: String, declarationsText: String = ""): CompiledPattern =
    compilePattern(SreParser.parsePattern(patternText), declarationsText)

  def compilePattern(pat: Pattern, declarationsText: String = ""): CompiledPattern = {
    val (extras, exclusives) = SreParser.parseDeclarations(declarationsText)
    val rewritten = Selection.rewrite(pat.formula)
    val nfa = Thompson.eliminateEpsilon(Thompson.build(rewritten, exclusives))
    val streamNfa = Thompson.streaming(nfa)
    val preds = streamNfa.predicates ++ extras + Predicate.True
    val iso = Isomorphism.build(preds, exclusives)
    val sdfa = Sdfa.determinize(streamNfa, iso)
    CompiledPattern(pat, nfa, sdfa)
  }
}
