package graft.queries

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Janitor for the streaming-scaffold temp state (slice-source dirs,
  * checkpoint dirs). The slice caches in [[Cef]]/[[Pipeline]] own their
  * source dirs for the SESSION — deleting one mid-session strands every
  * later streaming gate — but nothing used to delete them at session
  * end, so back-to-back driver runs accumulated dozens of
  * `/tmp/graft-stream-src*` dirs whose tmpfs/page-cache pressure
  * uniformly ~2x-ed the whole streaming family in later benches (the
  * BENCH_r12 contamination incident, SCALE.md round-12 closing sweep).
  *
  * Three layers, so no manual /tmp hygiene is ever needed again:
  *
  *  1. every scaffold dir is [[track]]ed; a listener on the owning
  *     SparkContext deletes them all (and invalidates the slice caches)
  *     at `onApplicationEnd` — i.e. when `spark.stop()` runs;
  *  2. a JVM shutdown hook backstops sessions that exit without stop();
  *  3. [[sweepStale]] removes dirs left by CRASHED earlier JVMs — any
  *     `graft-`-prefixed scaffold dir whose mtime predates this JVM's
  *     start (a dir made by this process is always newer; one from a
  *     live concurrent process is too, so the sweep cannot race a
  *     sibling). Bench/SoloBench/Verify call it at startup.
  */
private[graft] object StreamScaffold {

  /** Scaffold dir-name prefixes this janitor owns. Every
    * `createTempDirectory` in the streaming scaffolds must use one of
    * these (asserted by ScaffoldCleanupSpec), or the stale sweep cannot
    * see it.
    */
  val Prefixes: Seq[String] =
    Seq("graft-stream-src", "graft-stream-slices",
      "graft-docstream-src", "graft-docstream-tmp", "graft-ckpt-")

  private val tracked = ConcurrentHashMap.newKeySet[Path]()
  private val invalidators = new java.util.concurrent.CopyOnWriteArrayList[Runnable]()
  private val jvmHooked = new AtomicBoolean(false)
  private val hookedApps = ConcurrentHashMap.newKeySet[String]()
  private val jvmStartMs =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getStartTime

  /** Register a slice-cache clearer, run whenever [[cleanAll]] deletes
    * the dirs those caches point at (a cache surviving its dirs would
    * strand the next session on dead paths).
    */
  def registerCache(invalidate: Runnable): Unit = invalidators.add(invalidate)

  /** Adopt `dir` for end-of-session deletion; returns it for chaining.
    * Installs the per-application listener and the JVM backstop on
    * first use.
    */
  def track(s: SparkSession, dir: Path): Path = {
    tracked.add(dir)
    if (jvmHooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => cleanAll(), "graft-scaffold-janitor"))
    if (hookedApps.add(s.sparkContext.applicationId))
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = cleanAll()
      })
    dir
  }

  /** Checkpoint dirs are per-run (deleted in the run's own finally);
    * tracking them too covers the throw-before-finally window and
    * crashed JVMs (via the name prefix + [[sweepStale]]).
    */
  def newCheckpointDir(s: SparkSession, tag: String): Path =
    track(s, Files.createTempDirectory(s"graft-ckpt-$tag-"))

  def untrack(dir: Path): Unit = tracked.remove(dir)

  /** Delete every tracked dir and invalidate the slice caches. Safe to
    * call repeatedly; later sessions in the same JVM rebuild cleanly.
    */
  def cleanAll(): Unit = {
    invalidators.forEach(r => r.run())
    val it = tracked.iterator()
    while (it.hasNext) {
      val d = it.next()
      it.remove()
      try rmTree(d) catch { case _: Exception => } // best-effort at shutdown
    }
  }

  /** Remove scaffold dirs abandoned by PREVIOUS JVMs: name carries a
    * [[Prefixes]] prefix AND mtime predates this JVM's start. Returns
    * the number of dirs removed.
    */
  def sweepStale(): Int = {
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    if (!Files.isDirectory(tmp)) return 0
    import scala.jdk.CollectionConverters._
    val stale = Files.list(tmp).iterator().asScala.filter { p =>
      val n = p.getFileName.toString
      Prefixes.exists(n.startsWith) && Files.isDirectory(p) &&
        !tracked.contains(p) &&
        (try Files.getLastModifiedTime(p).toMillis < jvmStartMs
         catch { case _: Exception => false })
    }.toList
    stale.foreach(p => try rmTree(p) catch { case _: Exception => })
    stale.size
  }

  private def rmTree(p: Path): Unit = {
    if (!Files.exists(p)) return
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(f => Files.deleteIfExists(f))
  }
}
