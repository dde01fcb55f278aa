package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range/band joins — the interval-predicate joins Spark's planner turns
  * into nested-loop cartesians when written naively (`a JOIN b ON
  * abs(a.v - b.v) <= w` has no equi-key). The binned rewrite restores an
  * equi-join: bucket both sides by the band width, expand each left row
  * to its three candidate buckets, hash-join on (keys, bucket) and
  * verify the exact predicate on the joined pair.
  */
object RangeOps {

  /** Inner band join: rows (l, r) sharing `keys` with
    * |l.leftVal − r.rightVal| ≤ width.
    *
    * Scale shape: |l−r| ≤ w implies floor(r/w) ∈ {floor(l/w)−1, …+1},
    * so a 3-way bucket expansion of the LEFT side + one hash equi-join
    * on (keys, bucket) covers every qualifying pair exactly once (the
    * right row's bucket is unique, the three candidates are distinct) —
    * candidate sets are bucket-bounded, never the all-pairs cartesian a
    * naive theta-join plans; PlanSpec pins the absence of nested-loop
    * joins. Degenerate data (every value in one bucket) degrades to the
    * output bound itself, which is inherent to the band predicate.
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftVal: String,
      rightVal: String,
      width: Double): DataFrame = {
    require(width > 0, s"band width must be positive, got $width")
    require(!left.columns.contains("__band_bucket") && !right.columns.contains("__band_bucket"),
      "inputs must not already carry the internal column '__band_bucket'")
    // the post-join band filter references both value columns by bare
    // name: each must resolve to exactly one side or Spark's ambiguity
    // error surfaces mid-plan — fail fast with an actionable message
    require(!right.columns.contains(leftVal),
      s"left value column '$leftVal' also exists on the right input — rename one side")
    require(!left.columns.contains(rightVal),
      s"right value column '$rightVal' also exists on the left input — rename one side")
    val lb = floor(col(leftVal) / width).cast("long")
    val l = left.withColumn("__band_bucket", explode(array(lb - 1, lb, lb + 1)))
    val r = right.withColumn("__band_bucket", floor(col(rightVal) / width).cast("long"))
    l.join(r, keys :+ "__band_bucket")
      .filter(abs(col(leftVal) - col(rightVal)) <= width)
      .drop("__band_bucket")
  }
}
