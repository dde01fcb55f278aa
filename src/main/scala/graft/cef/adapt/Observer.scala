package graft.cef.adapt

import scala.collection.mutable

/** O1: the Observer — a keyed state machine over global reports that
  * decides when the model needs retraining or re-optimization
  * (reference ObserverProcess.java:72-166, defaults from Makefile:55-69).
  *
  * Rules, in order:
  *   - silent window (batch tp+fp+fn == 0): skip, still count down grace;
  *   - during grace countdown: skip;
  *   - batch MCC < lowScore (0.2)             → optimize;
  *   - drop vs previous score > optDiff (0.10) → optimize;
  *   - drop vs previous score > trainDiff (0.05) → retrain.
  * Each emitted instruction restarts the grace countdown.
  */
final class Observer(
    lowScore: Double = 0.2,
    optDiff: Double = 0.10,
    trainDiff: Double = 0.05,
    historyK: Int = 5,
    graceInit: Int = 2) extends Serializable {

  private val scores = mutable.Queue.empty[Double]
  private var grace = 0
  private var modelId = 0

  def onReport(r: Report): Option[Instruction] = {
    if (r.batch.tp + r.batch.fp + r.batch.fn == 0) {
      if (grace > 0) grace -= 1
      return None
    }
    val current = r.batch.mcc
    scores += current
    while (scores.size > historyK) scores.dequeue()

    if (grace > 0) { grace -= 1; return None }

    val decision: Option[String] =
      if (current < lowScore) Some("optimize")
      else if (scores.size >= 2) {
        val diff = scores(scores.size - 2) - current
        if (diff > optDiff) Some("optimize")
        else if (diff > trainDiff) Some("retrain")
        else None
      } else None

    decision.map { d =>
      val id = modelId
      modelId += 1
      grace = graceInit
      Instruction(id, r.timestamp, d, s"dynamic_v$id",
        Map(
          "mcc" -> current,
          "f_val" -> -current, // minimize(-mcc) == maximize(mcc)
          "precision" -> r.batch.precision,
          "recall" -> r.batch.recall,
          "f1" -> r.batch.f1))
    }
  }
}
