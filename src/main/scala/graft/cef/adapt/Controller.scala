package graft.cef.adapt

import scala.util.Random

/** O3: seeded ask/tell hyper-parameter optimizer over the reference's
  * search space — pMin ∈ [0.001, 0.1], gamma ∈ [0, 0.005], 5 initial
  * points, 10 total evaluations, seed 42 (optimizer.py:78-120).
  *
  * The reference uses skopt GP+EI; there is no skopt on the JVM, so this
  * keeps the exact ask/tell CONTRACT (propose n_total pairs, track argmin)
  * with a deterministic strategy: latin-hypercube-style seeded exploration
  * for the initial points, then seeded Gaussian exploitation around the
  * incumbent best (documented deviation, SURVEY.md §7.1.4: "semantics only
  * require: propose 10 (pMin,gamma) pairs, pick argmin f_val").
  */
final class AskTellOptimizer(
    val nInitialPoints: Int = 5,
    val nTotalEvals: Int = 10,
    seed: Long = 42L) extends Serializable {

  val space: List[(Double, Double)] = List((0.001, 0.1), (0.0, 0.005))

  private val rnd = new Random(seed)
  private val asked = scala.collection.mutable.ListBuffer.empty[List[Double]]
  private val told = scala.collection.mutable.ListBuffer.empty[Double]
  private var bestI = 0
  private var bestObj = Double.PositiveInfinity

  private def clip(v: Double, lo: Double, hi: Double): Double = math.max(lo, math.min(hi, v))

  def ask(): List[Double] = {
    val i = asked.size
    val p =
      if (i < nInitialPoints) {
        // stratified (latin-hypercube-style) init: stratum i of each dim,
        // jittered — deterministic under the seed
        space.map { case (lo, hi) =>
          val w = (hi - lo) / nInitialPoints
          lo + w * i + w * rnd.nextDouble()
        }
      } else if (told.isEmpty) {
        space.map { case (lo, hi) => lo + (hi - lo) * rnd.nextDouble() }
      } else {
        // exploit: gaussian step around the incumbent best, σ = 10% of range
        val center = asked(bestI)
        space.zip(center).map { case ((lo, hi), c) =>
          clip(c + rnd.nextGaussian() * 0.1 * (hi - lo), lo, hi)
        }
      }
    asked += p
    p
  }

  def tell(fVal: Double): Boolean = {
    require(asked.size > told.size, "tell() without a pending ask()")
    told += fVal
    if (fVal < bestObj) { bestObj = fVal; bestI = told.size - 1 }
    told.size < nTotalEvals
  }

  def best: (Int, Double, List[Double]) = (bestI, bestObj, asked(bestI))
  def iterations: Int = told.size
}

/** O2: the Controller state machine — drives the Bayesian loop between
  * Observer instructions and Factory reports
  * (reference controller_coprocess.py:88-257; phases optimizer.py:30-37).
  *
  * Inputs arrive from two streams (instructions, factory reports); outputs
  * go to two sinks (factory commands, engine sync) — the caller routes
  * [[Controller.Out]] accordingly.
  */
final class Controller(
    mkOptimizer: () => AskTellOptimizer = () => new AskTellOptimizer()) extends Serializable {

  sealed trait Phase
  case object Idle extends Phase
  case object WaitingForReport extends Phase
  case object Finalizing extends Phase

  final case class Out(
      factoryCommands: List[FactoryCommand] = Nil,
      syncCommands: List[SyncCommand] = Nil)

  private var phase: Phase = Idle
  private var opt: AskTellOptimizer = _
  private var optimizeCounter = 0
  private var trainCounter = 0
  private var commandCounter = 0
  private var sessionTs = 0L

  def currentPhase: String = phase.toString

  private def cmdId(): String = { val c = commandCounter; commandCounter += 1; s"cmd-$c" }

  def onInstruction(ins: Instruction): Out = ins.instructionType match {
    case "retrain" =>
      // direct train command, no pause (controller_coprocess.py:100-115)
      val cmd = FactoryCommand("train", cmdId(), trainCounter, -1, ins.timestamp,
        Some(List(0.05, 0.001)), -1) // current best defaults, optimizer.py:103
      trainCounter += 1
      Out(factoryCommands = List(cmd))
    case "optimize" if phase == Idle =>
      opt = mkOptimizer()
      sessionTs = ins.timestamp
      val pause = SyncCommand.pause(ins.timestamp)
      val init = FactoryCommand("opt_initialise", cmdId(), -1, optimizeCounter, ins.timestamp, None, -1)
      val firstParams = opt.ask()
      val step = FactoryCommand("opt_step", cmdId(), -1, optimizeCounter, ins.timestamp, Some(firstParams), -1)
      phase = WaitingForReport
      Out(factoryCommands = List(init, step), syncCommands = List(pause))
    case _ =>
      Out() // optimize while busy: ignored, like the reference's phase guard
  }

  def onFactoryReport(rep: FactoryReport): Out = rep.reportType match {
    case "error" =>
      // abort: unpause with no model change (controller_coprocess.py:240-257)
      phase = Idle
      Out(syncCommands = List(SyncCommand.play(sessionTs, -1)))
    case "opt_step_done" if phase == WaitingForReport =>
      val fVal = rep.metrics.getOrElse("f_val", -rep.metrics.getOrElse("mcc", 0.0))
      val continue = opt.tell(fVal)
      if (continue) {
        val params = opt.ask()
        Out(factoryCommands = List(
          FactoryCommand("opt_step", cmdId(), -1, optimizeCounter, sessionTs, Some(params), -1)))
      } else {
        phase = Finalizing
        val (bestI, _, _) = opt.best
        Out(factoryCommands = List(
          FactoryCommand("opt_finalise", cmdId(), -1, optimizeCounter, sessionTs, None, bestI)))
      }
    case "opt_finalised" if phase == Finalizing =>
      phase = Idle
      optimizeCounter += 1
      Out(syncCommands = List(SyncCommand.play(sessionTs, rep.modelId)))
    case "trained" =>
      Out() // model distributed via model_reports; engine picks it up
    case _ => Out()
  }
}
