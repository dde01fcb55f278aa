package graft.cef

import scala.collection.mutable
import scala.util.Random

/** F7: discrete-observation hidden Markov model forecaster (the reference's
  * HMMInterface wraps the smile library, model/forecaster/HMMInterface
  * .scala:1-215; smile is not in this container so Baum-Welch and the
  * forecasting recursion are implemented from first principles).
  *
  * Observations are the engine's minterm symbols. Forecasting couples the
  * HMM with the pattern SDFA exactly: the joint distribution over
  * (hidden state × SDFA state) is finite and propagates in closed form, so
  * the waiting-time distribution needs no sampling.
  *
  * @param pi initial hidden-state distribution
  * @param a  a(i)(j) = P(h_{t+1}=j | h_t=i)
  * @param b  b(i)(o) = P(obs=o | h=i)
  */
final case class Hmm(pi: Array[Double], a: Array[Array[Double]], b: Array[Array[Double]]) {
  val nStates: Int = pi.length
  val nSymbols: Int = b(0).length

  /** Log-likelihood of an observation sequence (scaled forward algorithm).
    * A zero-probability step (e.g. a held-out symbol with no emission mass)
    * contributes log(MinPositiveValue) and the belief resets to uniform
    * rather than poisoning the rest of the sequence with NaN.
    */
  def logLikelihood(obs: Seq[Int]): Double = {
    if (obs.isEmpty) return 0.0
    var alpha = Array.tabulate(nStates)(i => pi(i) * b(i)(obs.head))
    var ll = 0.0
    def scale(): Unit = {
      val s = alpha.sum
      ll += math.log(math.max(s, Double.MinPositiveValue))
      if (s == 0) { var i = 0; while (i < nStates) { alpha(i) = 1.0 / nStates; i += 1 } }
      else { var i = 0; while (i < nStates) { alpha(i) /= s; i += 1 } }
    }
    scale()
    obs.tail.foreach { o =>
      val next = new Array[Double](nStates)
      var j = 0
      while (j < nStates) {
        var acc = 0.0
        var i = 0
        while (i < nStates) { acc += alpha(i) * a(i)(j); i += 1 }
        next(j) = acc * b(j)(o)
        j += 1
      }
      alpha = next
      scale()
    }
    ll
  }

  /** Filtered hidden-state belief after observing the sequence — same
    * convention as the forward algorithm and Baum-Welch: pi is the state
    * distribution AT the first observation (no transition before the first
    * emission).
    */
  def belief(obs: Seq[Int]): Array[Double] = {
    if (obs.isEmpty) return pi.clone()
    var alpha = Array.tabulate(nStates)(i => pi(i) * b(i)(obs.head))
    def normalize(): Unit = {
      val s = alpha.sum
      alpha = if (s == 0) Array.fill(nStates)(1.0 / nStates) else alpha.map(_ / s)
    }
    normalize()
    obs.tail.foreach { o =>
      val next = new Array[Double](nStates)
      var j = 0
      while (j < nStates) {
        var acc = 0.0
        var i = 0
        while (i < nStates) { acc += alpha(i) * a(i)(j); i += 1 }
        next(j) = acc * b(j)(o)
        j += 1
      }
      alpha = next
      normalize()
    }
    alpha
  }

  /** Waiting-time distribution of the pattern: propagate the JOINT mass
    * over (hidden state, SDFA state); wt(t) = mass first entering an SDFA
    * final state at step t (same recursion shape as SPSTInterface
    * .computeWtDists, with the HMM belief replacing the PST label).
    */
  def wtDistribution(belief0: Array[Double], sdfa: Sdfa, sdfaState: Int, horizon: Int): WtDistribution = {
    // joint(h, s) over non-final s
    var joint = Array.tabulate(nStates)(h => {
      val row = new Array[Double](sdfa.nStates)
      row(sdfaState) = belief0(h)
      row
    })
    val wt = mutable.Map.empty[Int, Double]
    var t = 1
    while (t <= horizon) {
      val next = Array.fill(nStates)(new Array[Double](sdfa.nStates))
      var hit = 0.0
      var h = 0
      while (h < nStates) {
        var s = 0
        while (s < sdfa.nStates) {
          val m = joint(h)(s)
          if (m > 0) {
            // advance hidden state, emit a symbol, advance the SDFA
            var h2 = 0
            while (h2 < nStates) {
              val pTrans = m * a(h)(h2)
              if (pTrans > 0) {
                var o = 0
                while (o < nSymbols) {
                  val p = pTrans * b(h2)(o)
                  if (p > 0) {
                    val s2 = sdfa.delta(s)(o)
                    if (sdfa.isFinal(s2)) hit += p
                    else next(h2)(s2) += p
                  }
                  o += 1
                }
              }
              h2 += 1
            }
          }
          s += 1
        }
        h += 1
      }
      wt(t) = hit
      joint = next
      t += 1
    }
    WtDistribution(wt.toMap)
  }
}

object Hmm {

  /** Seeded random initialization (rows normalized). */
  def init(nStates: Int, nSymbols: Int, seed: Long): Hmm = {
    val rnd = new Random(seed)
    def row(n: Int): Array[Double] = {
      val r = Array.fill(n)(0.2 + rnd.nextDouble())
      val s = r.sum
      r.map(_ / s)
    }
    Hmm(row(nStates), Array.fill(nStates)(row(nStates)), Array.fill(nStates)(row(nSymbols)))
  }

  /** Baum-Welch EM over a single observation sequence with scaling.
    * Returns the trained model and the per-iteration log-likelihoods
    * (monotonically non-decreasing, the spec's invariant).
    */
  def baumWelch(obs: IndexedSeq[Int], nStates: Int, nSymbols: Int,
      iterations: Int = 20, seed: Long = 42L): (Hmm, Seq[Double]) = {
    var model = init(nStates, nSymbols, seed)
    val lls = mutable.ListBuffer.empty[Double]
    val T = obs.length

    for (_ <- 1 to iterations) {
      val Hmm(pi, a, b) = model
      // scaled forward
      val alpha = Array.ofDim[Double](T, nStates)
      val c = new Array[Double](T)
      for (i <- 0 until nStates) alpha(0)(i) = pi(i) * b(i)(obs(0))
      c(0) = alpha(0).sum
      for (i <- 0 until nStates) alpha(0)(i) /= c(0)
      for (t <- 1 until T) {
        for (j <- 0 until nStates) {
          var acc = 0.0
          for (i <- 0 until nStates) acc += alpha(t - 1)(i) * a(i)(j)
          alpha(t)(j) = acc * b(j)(obs(t))
        }
        c(t) = alpha(t).sum
        for (j <- 0 until nStates) alpha(t)(j) /= c(t)
      }
      lls += c.map(x => math.log(math.max(x, Double.MinPositiveValue))).sum

      // scaled backward
      val beta = Array.ofDim[Double](T, nStates)
      for (i <- 0 until nStates) beta(T - 1)(i) = 1.0
      for (t <- T - 2 to 0 by -1) {
        for (i <- 0 until nStates) {
          var acc = 0.0
          for (j <- 0 until nStates) acc += a(i)(j) * b(j)(obs(t + 1)) * beta(t + 1)(j)
          beta(t)(i) = acc / c(t + 1)
        }
      }

      // re-estimate
      val gamma = Array.ofDim[Double](T, nStates)
      for (t <- 0 until T) {
        var s = 0.0
        for (i <- 0 until nStates) { gamma(t)(i) = alpha(t)(i) * beta(t)(i); s += gamma(t)(i) }
        if (s > 0) for (i <- 0 until nStates) gamma(t)(i) /= s
      }
      val newPi = gamma(0).clone()
      val newA = Array.fill(nStates)(new Array[Double](nStates))
      for (t <- 0 until T - 1; i <- 0 until nStates; j <- 0 until nStates)
        newA(i)(j) += alpha(t)(i) * a(i)(j) * b(j)(obs(t + 1)) * beta(t + 1)(j) / c(t + 1)
      for (i <- 0 until nStates) {
        val s = newA(i).sum
        if (s > 0) for (j <- 0 until nStates) newA(i)(j) /= s
        else newA(i)(i) = 1.0
      }
      val newB = Array.fill(nStates)(new Array[Double](nSymbols))
      for (t <- 0 until T; i <- 0 until nStates) newB(i)(obs(t)) += gamma(t)(i)
      for (i <- 0 until nStates) {
        val s = newB(i).sum
        if (s > 0) for (o <- 0 until nSymbols) newB(i)(o) /= s
        else for (o <- 0 until nSymbols) newB(i)(o) = 1.0 / nSymbols
      }
      model = Hmm(newPi, newA, newB)
    }
    (model, lls.toSeq)
  }
}

/** T6: the FSM-state HMM estimator's model (reference estimator/
  * HMMEstimator/{FSMStateEstimator,IsoHMM}.scala — there the smile library
  * fits a supervised HMM; here the supervised fit is exact MLE counting,
  * distributed in [[graft.cef.spark.Train.learnFsmHmm]]).
  *
  * Hidden variable = the minterm symbol that fired (the isomorphism's
  * encoding); observed variable = the SDFA state reached. Training
  * sequences are the state/symbol windows ending whenever the run sits in
  * a final state ("finals-based learning", FSMStateEstimator.scala:60-101),
  * with depth = longest shortest path to a final + 1 — the unroll depth
  * the reference derives from the automaton.
  *
  * @param hmm    supervised model: pi/a over symbols, b(symbol)(state)
  * @param depth  training-window depth used at fit time
  * @param nFsmStates observed-alphabet size (SDFA state count)
  */
final case class FsmHmm(hmm: Hmm, depth: Int, nFsmStates: Int) {
  /** Likelihood of an observed SDFA state window under the fitted model. */
  def stateWindowLogLikelihood(states: Seq[Int]): Double = hmm.logLikelihood(states)
  /** Filtered belief over hidden minterm symbols given a state window. */
  def symbolBelief(states: Seq[Int]): Array[Double] = hmm.belief(states)
}
