package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The shared trained-model memo (round 15): nine cef queries consume
  * the IDENTICAL order-2 skip-any SPST and two the same time-windowed
  * SPSTm — each used to retrain it from scratch, eight-plus redundant
  * distributed aggregations per sweep. The memo is a driver-side
  * KB-sized value keyed by (application, dir, kind), deliberately
  * OUTSIDE the consumer-registered DataFrame release machinery
  * (nothing distributed is pinned). This spec pins the contract:
  *
  *  - consumers of one (dir, kind) trigger exactly ONE training;
  *  - a different dir is a different model (no cross-SF aliasing);
  *  - the memoized path returns the same results as the cold path
  *    (two consumers' outputs are deterministic and repeatable).
  */
class ModelMemoSpec extends AnyFlatSpec with Matchers {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").appName("model-memo-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(name: String, dir: String) = {
    graft.ops.Release.beginQuery(name)
    val out = SparkEntry.queries(name)(spark, dir).collect()
    graft.ops.Release.queryFinished(spark, name)
    out
  }

  behavior of "the shared trained-model memo"

  it should "train once for all consumers of one (dir, kind) and per dir otherwise" in {
    // cold memo regardless of suite ordering in the shared test JVM
    // (r15 ADVICE): an earlier suite touching these queries would
    // otherwise make every delta below read 0
    graft.ops.ModelMemo.clearForTest()
    val d1 = "/root/testdata/sf0.001"
    def count() = graft.ops.ModelMemo.trainCount.get()
    val base = count()

    // four SPST consumers, one training
    val wt1 = run("cef11_spst_wt", d1)
    run("cef12_spst_forecasts", d1)
    run("cef26_spst_fixedspread", d1)
    run("cef30_spst_classifywin", d1)
    count() - base shouldBe 1

    // the SPSTm pair shares one more training
    run("cef32_spstm_time", d1)
    run("cef41_streaming_spstm", d1)
    count() - base shouldBe 2

    // a different dir is a different model
    run("cef11_spst_wt", "/root/testdata/sf0.01")
    count() - base shouldBe 3

    // the memoized path reproduces the cold output exactly
    val wt1Again = run("cef11_spst_wt", d1)
    count() - base shouldBe 3
    wt1Again.map(_.toString).toSeq shouldBe wt1.map(_.toString).toSeq
  }

  it should "share one BPE merge learning across p42/p45/p49/p78 but not p48's adaptive path" in {
    graft.ops.ModelMemo.clearForTest()
    val d1 = "/root/testdata/sf0.001"
    def count() = graft.ops.ModelMemo.trainCount.get()
    val base = count()

    val merges = run("p42_txt_bpe", d1)
    run("p45_txt_bpe_encode", d1)
    run("p49_txt_bpe_tokenize", d1)
    run("p78_bpe_fertility", d1)
    count() - base shouldBe 1

    // the adaptive learner is NOT memo-fed (its claim is that the
    // batched schedule reproduces the sequential argmax on real data),
    // and its output matches the memoized sequential table exactly
    val batched = run("p48_txt_bpe_batched", d1)
    count() - base shouldBe 1
    batched.map(_.toString).sorted.toSeq shouldBe merges.map(_.toString).sorted.toSeq
  }

  it should "share one perceptron training across p55/p73/p96" in {
    graft.ops.ModelMemo.clearForTest()
    val d1 = "/root/testdata/sf0.001"
    def count() = graft.ops.ModelMemo.trainCount.get()
    val base = count()
    run("p55_quality_perceptron", d1)
    run("p73_quality_auc", d1)
    run("p96_quality_reliability", d1)
    count() - base shouldBe 1
  }

  it should "bound the cache (LRU) and retrain an evicted key on next use" in {
    import graft.ops.ModelMemo
    ModelMemo.clearForTest()
    def count() = ModelMemo.trainCount.get()
    val base = count()
    ModelMemo.cached(spark, "/tmp", "lru-probe-0")("v0": AnyRef)
    count() - base shouldBe 1
    // a hit is a hit
    ModelMemo.cached(spark, "/tmp", "lru-probe-0")("v0": AnyRef)
    count() - base shouldBe 1
    // fill past capacity: probe-0 is the eldest and falls out
    for (i <- 1 to ModelMemo.MaxEntries)
      ModelMemo.cached(spark, "/tmp", s"lru-probe-$i")(s"v$i": AnyRef)
    ModelMemo.entryCountForTest shouldBe ModelMemo.MaxEntries
    ModelMemo.cached(spark, "/tmp", "lru-probe-0")("v0": AnyRef)
    count() - base shouldBe (ModelMemo.MaxEntries + 2).toLong
  }

  it should "run trainings outside the map lock (r15 ADVICE)" in {
    import graft.ops.ModelMemo
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    ModelMemo.clearForTest()
    // a training may consult the memo for ANOTHER key (the
    // computeIfAbsent same-bin re-entry would deadlock here)
    val outer = ModelMemo.cached(spark, "/tmp", "reenter-outer") {
      ModelMemo.cached(spark, "/tmp", "reenter-inner")("inner": AnyRef)
    }
    outer shouldBe "inner"
    // an UNRELATED key trains to completion while another key's
    // training is still in flight (no shared lock across keys)
    val slowStarted = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val slow = new Thread(() => ModelMemo.cached(spark, "/tmp", "slow-key") {
      slowStarted.countDown()
      release.await(30, TimeUnit.SECONDS)
      "slow": AnyRef
    })
    slow.start()
    assert(slowStarted.await(30, TimeUnit.SECONDS), "slow training never started")
    // would block forever under a map-wide training lock
    ModelMemo.cached(spark, "/tmp", "fast-key")("fast": AnyRef) shouldBe "fast"
    release.countDown()
    slow.join(30000)
    slow.isAlive shouldBe false
  }
}
