package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key KMV snapshot emitted by [[SketchOps.streamingKmv]] each time a
  * micro-batch touches the key; the final snapshot (max `n_seen`) is the
  * full-stream estimate.
  */
final case class KmvSnap(
    user_id: Long, n_seen: Long, n_sample: Long, kth_min: Long, est_distinct: Long)

/** Cross-batch KMV accumulator: total events seen + the k smallest
  * DISTINCT hashes so far (ascending). Merging per batch is safe under
  * any batch split: the kept set only ever shrinks toward the true k
  * minima — an element dropped for being above the current kth-smallest
  * can never re-enter the k minima later.
  */
final case class KmvState(nSeen: Long, mins: Seq[Long])

/** Distributed probabilistic-sketch operators shared by the batch
  * queries (p34/p35/p37/p38) and the streaming gate (cef43).
  *
  * Everything here is DETERMINISTIC — fixed seeds, integer-only
  * arithmetic — so a DuckDB oracle can replay the exact formulas. The
  * 100 TB story is the classic sketch one: per-partition partial
  * aggregation into constant-size state (registers / k-min lists /
  * bit-sets), one shuffle of sketch-sized rows, never of the corpus.
  */
object SketchOps {

  // ---------------------------------------------------------------- bloom
  /** Bloom parameters: m = 4096 bits, 3 universal hashes
    * (h*a + b) % M % m with fixed odd multipliers. h < M ≈ 2³⁰ and
    * a < 2¹⁰ keep h*a far below 2⁶³ (DuckDB errors on overflow).
    */
  val BloomBits = 4096
  val BloomSeeds: Seq[(Long, Long)] = Seq((131L, 911L), (197L, 457L), (271L, 313L))

  /** The 3 bit positions of one element hash. */
  def bloomPositions(h: Column): Column = array(BloomSeeds.map { case (a, b) =>
    pmod(pmod(h * a + b, lit(TextOps.HashMod)), lit(BloomBits.toLong))
  }: _*)

  /** SQL twin of [[bloomPositions]]: a DuckDB list literal expression
    * over hash column expression `h`.
    */
  def bloomPositionsSql(h: String): String =
    BloomSeeds.map { case (a, b) =>
      s"(($h * $a + $b) % ${TextOps.HashMod}) % $BloomBits"
    }.mkString("[", ", ", "]")

  // ---------------------------------------------------------------- hll
  /** HLL parameters: m = 32 registers over the ~2³⁰ hash space.
    * register = h % 32; the remaining value w = h div 32 < 2²⁵, so its
    * rank rho = (leading zeros in 25 bits) + 1 = 26 - bitlength(w),
    * with the all-zero w pinned to 26. bitlength via `bin()` string
    * length — identical minimal-binary semantics in Spark and DuckDB —
    * keeps the whole estimator in BIGINT arithmetic (no float log2,
    * which the two engines could round differently at powers of two).
    */
  val HllM = 32
  val HllRhoMax = 26
  /** alpha_32 = 0.697 as the exact rational 697/1000 on both engines. */
  val HllAlphaNum = 697L
  val HllAlphaDen = 1000L

  /** rho(h) in [1, 26]: floor(h / 32) is exact in double below 2³⁰. */
  def hllRho(h: Column): Column = {
    val w = floor(h / lit(HllM)).cast("long")
    when(w === 0L, lit(HllRhoMax)).otherwise(lit(HllRhoMax) - length(bin(w)))
  }

  def hllRegister(h: Column): Column = pmod(h, lit(HllM.toLong))

  /** SQL twins over hash expression `h`. */
  def hllRhoSql(h: String): String =
    s"(CASE WHEN CAST(floor(($h) / $HllM) AS BIGINT) = 0 THEN $HllRhoMax " +
      s"ELSE $HllRhoMax - length(bin(CAST(floor(($h) / $HllM) AS BIGINT))) END)"
  def hllRegisterSql(h: String): String = s"(($h) % $HllM)"

  /** Fold one batch of hashes into the k smallest distinct seen so far.
    * Associative-safe under any stream batching (KmvSpec proves the
    * fold equals the global k-min for arbitrary splits).
    */
  def mergeKMins(prev: Seq[Long], hs: Iterable[Long], k: Int): Seq[Long] =
    (prev.toSet ++ hs).toSeq.sorted.take(k)

  // ------------------------------------------------------------ streaming
  /** Streaming KMV distinct-count: per key, fold each micro-batch's
    * hashes into the k smallest distinct seen so far (GroupState), and
    * emit a snapshot row per touched key per batch. The FINAL snapshot
    * (max n_seen per key) equals the batch KMV over the whole stream —
    * what the driver's oracle checks — while the intermediate snapshots
    * prove the state round-trips micro-batch boundaries.
    *
    * Scale shape: state is O(k) per key regardless of stream length;
    * the only shuffle is the groupByKey the stateful operator needs
    * anyway. The reference keeps per-key run state the same way
    * (WayebEngine.java:276-287); this is that machinery applied to an
    * aggregation sketch instead of an automaton run.
    */
  def streamingKmv(events: DataFrame, keyCol: String, hashCol: String, k: Int): Dataset[KmvSnap] = {
    implicit val stEnc: Encoder[KmvState] = Encoders.product[KmvState]
    implicit val outEnc: Encoder[KmvSnap] = Encoders.product[KmvSnap]
    implicit val kvEnc: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events.select(col(keyCol).cast("long"), col(hashCol).cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[KmvState, KmvSnap](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long)], state: GroupState[KmvState]) =>
          val prev = state.getOption.getOrElse(KmvState(0L, Nil))
          // chunked fold: a skewed key's whole micro-batch never
          // materializes — memory is O(k + chunk) however many events
          // the batch delivers to this key
          var merged = prev.mins
          var nNew = 0L
          val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
          rows.foreach { r =>
            buf += r._2; nNew += 1
            if (buf.size >= 4096) { merged = mergeKMins(merged, buf, k); buf.clear() }
          }
          if (buf.nonEmpty) merged = mergeKMins(merged, buf, k)
          val nSeen = prev.nSeen + nNew
          state.update(KmvState(nSeen, merged))
          val nSample = merged.size.toLong
          val kth = if (merged.isEmpty) 0L else merged.last
          val est =
            if (nSample < k) nSample
            else (k - 1).toLong * TextOps.HashMod / kth
          Iterator.single(KmvSnap(key, nSeen, nSample, kth, est))
      }
  }
}
