package graft

import graft.queries.StreamScaffold
import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import java.nio.file.{Files, Path, Paths}

/** The r12 contamination fix (VERDICT r12 item 1): streaming-scaffold
  * temp dirs must not outlive their SparkSession. Before this janitor,
  * back-to-back driver runs accumulated ~30 `/tmp/graft-stream-src*`
  * dirs whose tmpfs pressure uniformly ~2x-ed the streaming family in
  * the official BENCH_r12 (445.5 s vs a true 247.2 s).
  *
  * Asserted here against the REAL session-stop path: run a cef event
  * stream and the p50 doc stream, record the scaffold dirs on disk,
  * `spark.stop()`, and require every one gone — then require a fresh
  * session rebuilds cleanly (the slice caches were invalidated, not
  * stranded on dead paths).
  */
class ScaffoldCleanupSpec extends AnyFlatSpec with Matchers {

  private val sfDir = "/root/testdata/sf0.001"

  private def newSession(): SparkSession = SparkSession.builder()
    .master("local[4]").appName("scaffold-cleanup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def scaffoldDirs(): Set[Path] = {
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    import scala.jdk.CollectionConverters._
    Files.list(tmp).iterator().asScala.filter { p =>
      StreamScaffold.Prefixes.exists(p.getFileName.toString.startsWith)
    }.toSet
  }

  "StreamScaffold" should "delete every scaffold dir when the session stops, then rebuild cleanly" in {
    val s1 = newSession()
    SparkEntry.queries("cef22_streaming")(s1, sfDir).count() should be > 0L
    SparkEntry.queries("p50_dd_stream_neardup")(s1, sfDir).count() should be > 0L
    val live = scaffoldDirs()
    live.count(_.getFileName.toString.startsWith("graft-stream-src")) should be >= 1
    live.count(_.getFileName.toString.startsWith("graft-docstream-src")) should be >= 1
    s1.stop()
    // the listener bus drains on stop(), but allow a short grace window
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (live.exists(Files.exists(_)) && System.nanoTime() < deadline)
      Thread.sleep(50)
    val leftover = live.filter(Files.exists(_))
    withClue(s"scaffold dirs survived session stop: $leftover") {
      leftover shouldBe empty
    }

    // fresh session: the slice caches must have been invalidated with
    // their dirs, so the gates rebuild instead of reading a dead path
    val s2 = newSession()
    try {
      SparkEntry.queries("cef22_streaming")(s2, sfDir).count() should be > 0L
      scaffoldDirs().count(
        _.getFileName.toString.startsWith("graft-stream-src")) should be >= 1
    } finally s2.stop()
  }

  it should "sweep only PRE-JVM stale dirs, never this process's live ones" in {
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    val stale = Files.createTempDirectory("graft-stream-src")
    Files.createFile(stale.resolve("slice-001.parquet"))
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 3600L * 1000)
    Files.setLastModifiedTime(stale, old)
    val fresh = Files.createTempDirectory("graft-stream-src")
    try {
      StreamScaffold.sweepStale()
      Files.exists(stale) shouldBe false // predates JVM start → swept
      Files.exists(fresh) shouldBe true  // made by this JVM → kept
      // non-scaffold names are never touched regardless of age
      val other = Files.createTempDirectory("unrelated-tmp")
      Files.setLastModifiedTime(other, old)
      try { StreamScaffold.sweepStale(); Files.exists(other) shouldBe true }
      finally Files.deleteIfExists(other)
    } finally {
      Files.deleteIfExists(stale.resolve("slice-001.parquet"))
      Files.deleteIfExists(stale)
      Files.deleteIfExists(fresh)
    }
  }
}
