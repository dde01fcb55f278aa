package graft.ops

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for TRAINED MODELS — driver-side, KB-sized,
  * deterministic values (an SPST, a BPE merge list) that several
  * queries in one sweep would otherwise each relearn with their own
  * distributed aggregation. Keyed by (application, data dir, kind):
  * a fresh session retrains from scratch, a different sf dir is a
  * different model.
  *
  * Deliberately NOT the consumer-registered DataFrame release
  * machinery ([[Release]]): nothing distributed or storage-backed is
  * pinned, so there is nothing to release and no registration to
  * enforce — the entries are a few KB of driver heap for the life of
  * the application.
  */
object ModelMemo {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Actual trainings (cache misses) — test-visible so ModelMemoSpec
    * pins "N consumers, one training" directly.
    */
  private[graft] val trainCount = new java.util.concurrent.atomic.AtomicLong(0L)

  def cached[T <: AnyRef](s: SparkSession, dir: String, kind: String)(train: => T): T =
    cache.computeIfAbsent(
      s.sparkContext.applicationId + "#" +
        java.nio.file.Paths.get(dir).toAbsolutePath.normalize + "#" + kind,
      _ => { trainCount.incrementAndGet(); train }).asInstanceOf[T]
}
