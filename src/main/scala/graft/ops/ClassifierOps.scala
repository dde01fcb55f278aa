package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed training of a linear quality classifier over corpus-scale
  * feature tables — the "train a fastText-style quality filter on the
  * corpus itself" step of an LLM data pipeline (cf. GPT-3's quality
  * logistic regression, Brown et al. 2020 §A; CCNet's fastText filter).
  *
  * The learner is a BATCH PERCEPTRON over integer features: per epoch,
  * one full corpus pass computes the summed update Σ y·x over the
  * currently-misclassified rows, and the weight vector moves once. Every
  * quantity is an exact integer, so the distributed sum is
  * order-independent (no float reduction nondeterminism) and a SQL
  * oracle can replay the epochs unrolled — the same discipline as the
  * BPE merge loop (TextOps.bpeMerges) and Lloyd training
  * (SimilarityOps.lloydCentroids).
  *
  * Scale shape (the 100 TB story): each epoch is ONE map-side-combinable
  * aggregation over the feature table (partial sums per partition, a
  * 5-long-column final combine), and the model rides into the next epoch
  * as plain literals in the filter predicate — nothing is ever broadcast
  * or shuffled but the (epochs × 5)-cell result. The feature projection
  * is persisted once, so `epochs` passes scan a columnar cache, not the
  * raw text.
  */
object ClassifierOps {

  /** Batch-perceptron training epochs over an integer feature table.
    *
    * @param feats columns `x0, x1, x2, x3` (LongType features, x0 the
    *              bias column ≡ 1) and `y` (LongType label in {-1, +1})
    * @return one row per epoch: (epoch INT, w0..w3 BIGINT = weights
    *         AFTER the epoch's batch update, n_mis BIGINT = rows
    *         misclassified under the weights the epoch started with)
    */
  def perceptronEpochs(s: SparkSession, feats: DataFrame, epochs: Int): DataFrame = {
    val fs = feats.select(col("x0"), col("x1"), col("x2"), col("x3"), col("y")).persist()
    var w = Array(0L, 0L, 0L, 0L)
    val out = Seq.newBuilder[(Int, Long, Long, Long, Long, Long)]
    try for (e <- 1 to epochs) {
      val margin =
        (col("x0") * lit(w(0)) + col("x1") * lit(w(1)) +
          col("x2") * lit(w(2)) + col("x3") * lit(w(3))) * col("y")
      val mis = margin <= 0
      // one corpus pass: 4 conditional integer sums + a count, all
      // partially aggregable; the .head() is a 5-cell model fetch (the
      // same driver-side footprint as the BPE argmax / MLE matrix)
      val r = fs
        .agg(
          coalesce(sum(when(mis, col("y") * col("x0"))), lit(0L)).as("d0"),
          coalesce(sum(when(mis, col("y") * col("x1"))), lit(0L)).as("d1"),
          coalesce(sum(when(mis, col("y") * col("x2"))), lit(0L)).as("d2"),
          coalesce(sum(when(mis, col("y") * col("x3"))), lit(0L)).as("d3"),
          count(when(mis, lit(1))).as("mis"))
        .head()
      w = Array(w(0) + r.getLong(0), w(1) + r.getLong(1), w(2) + r.getLong(2), w(3) + r.getLong(3))
      out += ((e, w(0), w(1), w(2), w(3), r.getLong(4)))
    } finally fs.unpersist() // a failed epoch must not pin the corpus-scale cache
    import s.implicits._
    out.result().toDF("epoch", "w0", "w1", "w2", "w3", "n_mis")
  }

  /** Exact ROC-AUC of an integer score against a ±1 label, per group —
    * the Mann-Whitney rank-sum form with average-rank tie handling:
    * AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻), R⁺ = Σ avg-rank of positives,
    * reported as a ×10⁶-quantized integer (`auc_q`; −1 when a group is
    * single-class and AUC is undefined).
    *
    * Every quantity is integer: for a tie group of size t ending at
    * cumulative count c, twice the average rank is 2c − t + 1, so
    * 2R⁺ = Σ n⁺_g·(2c_g − t_g + 1) and
    * auc_q = (2R⁺ − n⁺(n⁺+1))·10⁶ div (2·n⁺·n⁻) — bit-identical across
    * engines and row orders, no float boundary.
    *
    * Scale shape: one map-side-combinable aggregation collapses the
    * corpus to a (group, score) HISTOGRAM; the rank window and final
    * fold run over distinct scores only (≪ rows for any quantized
    * score). Like p61/p69/p72, this is an EVALUATOR: at production
    * scale it runs on an eval sample, and the integer form is exact up
    * to ~2·10⁶ scored rows per group before (2R⁺)·10⁶ would need
    * DECIMAL(38) headroom.
    *
    * @param scored columns `groupCol` (any orderable type), `scoreCol`
    *               (BIGINT, higher = predicted more positive), `yCol`
    *               (BIGINT in {-1, +1})
    * @return one row per group: (groupCol, n_pos, n_neg, auc_q)
    */
  def rocAucQ(scored: DataFrame, groupCol: String, scoreCol: String, yCol: String): DataFrame = {
    val h = scored.groupBy(col(groupCol), col(scoreCol))
      .agg(
        count(lit(1)).as("n_tot"),
        count(when(col(yCol) === 1L, lit(1))).as("n_pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(scoreCol))
    h.withColumn("two_avg", lit(2L) * sum(col("n_tot")).over(w) - col("n_tot") + 1L)
      .groupBy(col(groupCol))
      .agg(
        sum(col("n_pos")).as("np"),
        (sum(col("n_tot")) - sum(col("n_pos"))).as("nn"),
        sum(col("n_pos") * col("two_avg")).as("two_r"))
      .select(
        col(groupCol),
        col("np").as("n_pos"),
        col("nn").as("n_neg"),
        when(col("np") === 0L || col("nn") === 0L, lit(-1L))
          .otherwise(expr("((two_r - np * (np + 1)) * 1000000) div (2 * np * nn)"))
          .as("auc_q"))
  }
}
