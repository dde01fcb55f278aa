package graft.ops

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for TRAINED MODELS — driver-side, KB-sized,
  * deterministic values (an SPST, a BPE merge list) that several
  * queries in one sweep would otherwise each relearn with their own
  * distributed aggregation. Keyed by (application, data dir, kind):
  * a fresh session retrains from scratch, a different sf dir is a
  * different model.
  *
  * Two structural rules (the r15 ADVICE findings):
  *
  *  - training runs under a PER-KEY holder's lazy-init monitor, never
  *    under any map-wide or hash-bin lock — concurrent unrelated keys
  *    train in parallel, and a train closure may itself consult the
  *    memo for another key without deadlock (both pinned by
  *    ModelMemoSpec);
  *  - the map is a tiny access-order LRU ([[MaxEntries]] entries —
  *    generous for any sweep, which touches a handful of (dir, kind)
  *    pairs), so a long-lived server sweeping many datasets or
  *    applications in one JVM cannot retain every model it ever
  *    trained: the eldest entry falls out and simply retrains on next
  *    use.
  *
  * Deliberately NOT the consumer-registered DataFrame release
  * machinery ([[Release]]): nothing distributed or storage-backed is
  * pinned, so there is nothing to release and no registration to
  * enforce — live entries are a few KB of driver heap.
  */
object ModelMemo {

  /** LRU capacity: any single sweep uses well under a dozen distinct
    * (dir, kind) pairs; 64 gives several concurrent applications
    * headroom while keeping worst-case retention at KBs.
    */
  private[graft] val MaxEntries = 64

  /** Per-key memo cell. `value` is a lazy val, so the training body
    * executes under THIS object's monitor only — evaluation is
    * exactly-once per holder, and the shared map is never locked while
    * a (minutes-long, Spark-job-running) training is in flight.
    */
  private final class Holder(train: () => AnyRef) {
    lazy val value: AnyRef = { trainCount.incrementAndGet(); train() }
  }

  // access-order LinkedHashMap: get() refreshes recency, put() beyond
  // MaxEntries drops the eldest. All map ops are O(1) under a lock held
  // only for the lookup/insert itself.
  private val cache =
    new java.util.LinkedHashMap[String, Holder](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Holder]): Boolean =
        size() > MaxEntries
    }

  /** Actual trainings (cache misses) — test-visible so ModelMemoSpec
    * pins "N consumers, one training" directly.
    */
  private[graft] val trainCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Test hook: specs asserting trainCount DELTAS must start from a
    * cold memo regardless of which suites ran earlier in the shared
    * forked test JVM (r15 ADVICE — suite-ordering fragility).
    */
  private[graft] def clearForTest(): Unit = cache.synchronized { cache.clear() }

  private[graft] def entryCountForTest: Int = cache.synchronized { cache.size() }

  def cached[T <: AnyRef](s: SparkSession, dir: String, kind: String)(train: => T): T = {
    val key = s.sparkContext.applicationId + "#" +
      java.nio.file.Paths.get(dir).toAbsolutePath.normalize + "#" + kind
    val holder = cache.synchronized {
      var h = cache.get(key)
      if (h == null) { h = new Holder(() => train); cache.put(key, h) }
      h
    }
    // outside the map lock: first caller trains, concurrent callers of
    // the SAME key block on this holder only, other keys proceed. An
    // evicted-while-training holder still completes for its waiters —
    // it just isn't cached for the next consumer.
    holder.value.asInstanceOf[T]
  }
}
