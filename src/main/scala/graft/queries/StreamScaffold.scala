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
  *  3. [[sweepStale]] removes dirs left by DEAD earlier JVMs. Ownership
  *     is explicit: every scaffold dir carries an owner-PID marker file
  *     written at creation, and the sweep skips any dir whose owning
  *     process is still alive — a sibling JVM that started EARLIER than
  *     this one but is still RUNNING keeps its live slice caches (the
  *     r13 advice: the old mtime-vs-JVM-start rule would have deleted
  *     them out from under it). Unmarked dirs (pre-marker leftovers)
  *     fall back to the mtime rule. Bench/SoloBench/Verify call it at
  *     startup.
  */
private[graft] object StreamScaffold {

  /** Scaffold dir-name prefixes this janitor owns. Every
    * `createTempDirectory` in the streaming scaffolds AND the probe
    * mains must go through [[newScaffoldDir]]/[[track]] with one of
    * these (asserted by ScaffoldCleanupSpec), or the stale sweep cannot
    * see it.
    */
  val Prefixes: Seq[String] =
    Seq("graft-stream-src", "graft-stream-slices",
      "graft-docstream-src", "graft-docstream-tmp", "graft-ckpt-",
      "graft-batchprobe")

  /** Name of the owner-PID marker written into every scaffold dir. */
  val OwnerMarker = ".graft-owner.pid"

  /** Where scaffold dirs live, in preference order. All scaffold state
    * is EPHEMERAL by contract — re-derivable slice rewrites and per-run
    * checkpoints this janitor deletes at session end — so it belongs on
    * RAM-backed tmpfs when one exists: the per-query streaming constant
    * is dominated by fixed-cost checkpoint I/O (offset/commit WAL,
    * state-store deltas — ~0.3 s/query of fsync-bound metadata writes
    * when java.io.tmpdir is disk-backed, ScaffoldCostMain r16 grid),
    * none of which needs durability here. Production checkpoints belong
    * on durable shared storage and never go through this scaffold —
    * this is the TEST harness's state, sized in MBs.
    *
    * [[sweepStale]] scans EVERY base (not just the preferred one), so a
    * JVM upgraded to the tmpfs base still reaps dirs a dead pre-upgrade
    * sibling left on the disk-backed one.
    */
  private[graft] val bases: Seq[Path] = {
    val shm = Paths.get("/dev/shm")
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    (if (Files.isDirectory(shm) && Files.isWritable(shm)) Seq(shm, tmp)
     else Seq(tmp)).distinct
  }

  private val tracked = ConcurrentHashMap.newKeySet[Path]()
  private val invalidators = new java.util.concurrent.CopyOnWriteArrayList[Runnable]()
  private val jvmHooked = new AtomicBoolean(false)
  private val hookedApps = ConcurrentHashMap.newKeySet[String]()
  private val jvmStartMs =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getStartTime

  /** Create a scaffold temp dir with its owner-PID marker. ALL scaffold
    * dirs must be born here (tracked or not), so [[sweepStale]] in a
    * later or concurrent JVM can decide ownership by liveness instead
    * of guessing from mtimes.
    */
  def newScaffoldDir(prefix: String): Path = {
    require(Prefixes.exists(prefix.startsWith),
      s"scaffold prefix '$prefix' not in StreamScaffold.Prefixes — sweepStale could not see it")
    val dir = Files.createTempDirectory(bases.head, prefix)
    writeOwnerMarker(dir)
    dir
  }

  private def writeOwnerMarker(dir: Path): Unit =
    try Files.writeString(dir.resolve(OwnerMarker),
      ProcessHandle.current().pid().toString)
    catch { case _: Exception => () } // marker-less dirs degrade to the mtime rule

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
    writeOwnerMarker(dir) // idempotent; covers dirs not born in newScaffoldDir
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
    track(s, newScaffoldDir(s"graft-ckpt-$tag-"))

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

  /** Remove scaffold dirs abandoned by DEAD JVMs. A candidate (a
    * [[Prefixes]]-named dir this process doesn't track) is stale when:
    *
    *  - its [[OwnerMarker]] names a pid with no live process — swept
    *    regardless of mtime (fast crash recovery), while a marker
    *    naming a LIVE process (a concurrently running sibling, however
    *    long ago it started) is NEVER swept; or
    *  - it has no readable marker (pre-marker leftovers), and its
    *    mtime predates this JVM's start — the old heuristic, kept only
    *    as the unmarked-dir fallback.
    *
    * Returns the number of dirs removed.
    */
  def sweepStale(): Int = {
    import scala.jdk.CollectionConverters._
    val stale = bases.filter(Files.isDirectory(_)).flatMap { base =>
      Files.list(base).iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        Prefixes.exists(n.startsWith) && Files.isDirectory(p) &&
          !tracked.contains(p) &&
          (ownerAlive(p) match {
            case Some(alive) => !alive
            case None =>
              try Files.getLastModifiedTime(p).toMillis < jvmStartMs
              catch { case _: Exception => false }
          })
      }.toList
    }
    stale.foreach(p => try rmTree(p) catch { case _: Exception => })
    stale.size
  }

  /** Some(true) if the dir's marker names a live process (this one or
    * a sibling), Some(false) if the owner is dead, None if no marker
    * can be read.
    */
  private def ownerAlive(p: Path): Option[Boolean] =
    try {
      val f = p.resolve(OwnerMarker)
      if (!Files.isRegularFile(f)) None
      else {
        val pid = Files.readString(f).trim.toLong
        Some(pid == ProcessHandle.current().pid() ||
          ProcessHandle.of(pid).map[java.lang.Boolean](_.isAlive).orElse(false))
      }
    } catch { case _: Exception => None }

  private def rmTree(p: Path): Unit = {
    if (!Files.exists(p)) return
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse
      .foreach(f => Files.deleteIfExists(f))
  }
}
