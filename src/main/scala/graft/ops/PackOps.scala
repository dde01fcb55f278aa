package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: place documents into
  * fixed-token-budget bins (the "example packing" step before LLM
  * pretraining batches). Global greedy packing is inherently sequential,
  * so the distributed form is BUCKET-LOCAL greedy: documents hash into
  * `buckets` independent streams, each packed greedily in doc-id order.
  * This is the standard shard-local packing real pipelines use — bin
  * quality is within one doc of first-fit, and every bucket packs in
  * parallel.
  *
  * Scale shape: ONE shuffle (repartition on bucket) followed by Spark's
  * EXTERNAL sort within partitions and a streaming mapPartitions — the
  * greedy scan holds O(1) state per bucket and never materializes a
  * bucket in memory, so bucket size is bounded by disk, not heap.
  * `buckets` is the parallelism knob: at 100 TB raise it so each bucket
  * sorts comfortably (the greedy itself is O(n)).
  */
object PackOps {

  /** Returns (doc_id, bucket, n_tok, bin_id): greedy packing of each
    * bucket's docs (in doc_id order) into bins of at most `budget`
    * tokens; a document larger than the budget occupies a bin alone.
    */
  def packGreedy(
      docs: DataFrame,
      idCol: String,
      nTokCol: String,
      buckets: Int,
      budget: Long): DataFrame = {
    val sparkS = docs.sparkSession
    import sparkS.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(nTokCol).cast("long").as("n_tok"),
        pmod(col(idCol).cast("long"), lit(buckets.toLong)).as("bucket"))
      .repartition(buckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // several buckets can hash into one partition; the sort groups
        // them, so the O(1) greedy state just resets on bucket change
        var cur = Long.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (docId, nTok, bucket) =>
          if (bucket != cur) { cur = bucket; bin = 0L; fill = 0L }
          if (fill > 0L && fill + nTok > budget) { bin += 1L; fill = nTok }
          else fill += nTok
          (docId, bucket, nTok, bin)
        }
      }
      .toDF("doc_id", "bucket", "n_tok", "bin_id")
  }
}
