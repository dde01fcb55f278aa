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
}
