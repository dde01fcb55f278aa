package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import scala.jdk.CollectionConverters._

/** Concurrency fuzz for the deterministic release machinery. The r14
  * hardening (session-scoped notifications, early-finisher prune, one
  * memo monitor) was spec-pinned only SEQUENTIALLY, while the hazards
  * it fixes are concurrent: two sessions sweeping on interleaved
  * threads, memos created mid-sweep while notifications fly, consumers
  * completing in arbitrary order. This spec replays those
  * interleavings with seeded randomness and pins the invariants the
  * sequential MemoLifetimeSpec cannot:
  *
  *  - a session's memo NEVER releases while one of its own registered
  *    consumers is outstanding — in particular, the OTHER session
  *    notifying the same consumer names concurrently must not drain
  *    it (cross-session isolation under real interleaving);
  *  - once the last outstanding consumer notifies, the memo IS
  *    released, exactly once — including when the memo's registration
  *    races the notifications on another thread (the lost-notification
  *    window closed by the post-registration re-drain): no memo may
  *    stay pinned to the execution backstop.
  */
class ReleaseConcurrencySpec extends AnyFlatSpec with Matchers {

  private lazy val base: SparkSession = SparkSession.builder()
    .master("local[4]").appName("release-concurrency-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Distinct logical plan per call: the cache manager dedupes persisted
    * data BY PLAN, so two fuzz rounds persisting an identical plan would
    * share one cache entry and unpersist each other.
    */
  private def freshDf(s: SparkSession, tag: Int): DataFrame =
    s.range(10 + tag).toDF("v")

  "two sessions sweeping on interleaved threads with random consumer order" should
      "release each memo exactly after ITS last consumer, never early" in {
    val sessions = Seq(base, base.newSession())
    val seeds = Seq(0xC0FFEE01L, 0xC0FFEE02L)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // SAME consumer names in both sessions — the sharpest cross-session
    // test: every notification in one session is a plausible (and
    // forbidden) drain of the other's memo
    val consumers = (0 until 5).map(i => s"cc$i").toSet

    val threads = sessions.zipWithIndex.map { case (s, si) =>
      new Thread(() => {
        val r = new scala.util.Random(seeds(si))
        try {
          for (round <- 0 until 12) {
            graft.ops.Release.sweepStart(s)
            val order = r.shuffle(consumers.toSeq)
            // the memo is created mid-sweep after a random number of its
            // consumers already completed (the early-finisher prune path
            // — a "failed" consumer is indistinguishable from a finished
            // one: runners notify either way)
            val createAt = r.nextInt(order.size)
            var memo: Option[DataFrame] = None
            val released = new java.util.concurrent.atomic.AtomicInteger(0)
            order.zipWithIndex.foreach { case (name, i) =>
              if (i == createAt) {
                memo = graft.ops.Release.afterConsumersPending(
                  freshDf(s, si * 1000 + round * 10), consumers,
                  () => { released.incrementAndGet(); () })
                if (memo.isEmpty)
                  errors.add(s"s$si r$round: born-released with " +
                    s"${order.size - createAt} consumers outstanding")
              }
              // unrelated-name noise: must never move the release point
              if (r.nextInt(4) == 0)
                graft.ops.Release.queryFinished(s, s"noise_${r.nextInt(100)}")
              graft.ops.Release.queryFinished(s, name)
              val outstanding = order.size - 1 - i
              memo.foreach { m =>
                if (outstanding > 0 && m.storageLevel == StorageLevel.NONE)
                  errors.add(s"s$si r$round: released EARLY — $outstanding of its own " +
                    s"consumers still outstanding after $name")
              }
            }
            memo.foreach { m =>
              if (m.storageLevel != StorageLevel.NONE)
                errors.add(s"s$si r$round: memo PINNED past its last consumer")
              if (released.get() != 1)
                errors.add(s"s$si r$round: onRelease ran ${released.get()} times (want 1)")
            }
          }
        } catch { case e: Throwable => errors.add(s"s$si threw: $e") }
      }, s"release-fuzz-$si")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(180000L))
    threads.foreach(t => withClue(s"${t.getName} still alive: ") { t.isAlive shouldBe false })
    withClue("concurrent-sweep invariant violations: ") {
      errors.asScala.toList shouldBe empty
    }
  }

  "a memo whose registration races its consumers' notifications on another thread" should
      "never lose a notification (released once all names reported, not pinned)" in {
    val s = base.newSession()
    val consumers = (0 until 4).map(i => s"rc$i").toSet
    for (round <- 0 until 50) {
      graft.ops.Release.sweepStart(s)
      val latch = new java.util.concurrent.CountDownLatch(1)
      val notifier = new Thread(() => {
        latch.await()
        consumers.toSeq.sorted.foreach(n => graft.ops.Release.queryFinished(s, n))
      }, s"race-notifier-$round")
      notifier.start()
      latch.countDown()
      // registration lands at a random point inside the notifier's burst
      // (scheduler-dependent; 50 rounds cover the window) — the old code
      // could snapshot the finished set, miss a name recorded between the
      // snapshot and live.add, and pin the memo until the 4096-execution
      // backstop. The post-registration re-drain closes exactly that.
      val memo = graft.ops.Release.afterConsumersPending(
        freshDf(s, 100000 + round), consumers, () => ())
      notifier.join(30000L)
      notifier.isAlive shouldBe false
      // every consumer has reported: the memo is either born-released
      // (None) or MUST be unpersisted by now — no spin-wait, release is
      // runner-thread synchronous on whichever side saw the last name
      memo.foreach { m =>
        withClue(s"round $round: memo pinned after all consumers notified: ") {
          m.storageLevel shouldBe StorageLevel.NONE
        }
      }
    }
  }
}
