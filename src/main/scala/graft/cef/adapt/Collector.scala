package graft.cef.adapt

import graft.cef.CEvent
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** O5/O6 + S11: the Collector — bucketed JSONL event archive feeding the
  * Factory's dataset assembly (reference Collector.java:119-310).
  *
  *   - bucketId = ts - ts % bucketSizeSec; each event appends to
  *     `dir/buckets/<prefix><bucketId>`;
  *   - on bucket rotation: the finished bucket joins the history and a
  *     dataset notification goes out with the last K bucket ids;
  *   - on assembly ACK: buckets older than the ACKed range are deleted.
  *
  * The reference opens the file with O_SYNC per event (Collector.java:
  * 228-240) — here appends are batched per micro-batch (`foreachBatch`),
  * semantically identical bucket files with radically better throughput
  * (SURVEY.md §4.2).
  */
final class Collector(
    dir: String,
    bucketSizeSec: Long = 86400L,
    lastK: Int = 7,
    prefix: String = "bucket_") extends Serializable {

  private val history = mutable.ArrayBuffer.empty[Long] // finished buckets, ascending
  private var currentBucket = -1L
  private var version = 0
  private var datasetId = 0

  private def bucketPath(b: Long) = Paths.get(s"$dir/buckets/$prefix$b")

  def eventJson(e: CEvent): String = Json.render(
    "id" -> e.id, "eventType" -> e.eventType, "timestamp" -> e.timestamp,
    "partition" -> e.partition, "num" -> e.num, "str" -> e.str)

  /** Process a (time-ordered) batch of events; returns notifications for
    * every bucket completed within the batch.
    */
  def processBatch(events: Seq[CEvent]): Seq[DatasetNotification] = {
    val out = mutable.ListBuffer.empty[DatasetNotification]
    val grouped = events.filterNot(_.isReset).sortBy(e => (e.timestamp, e.id))
    Files.createDirectories(Paths.get(s"$dir/buckets"))
    grouped.groupBy(e => e.timestamp - (e.timestamp % bucketSizeSec)).toSeq.sortBy(_._1)
      .foreach { case (bucket, evs) =>
        if (currentBucket == -1L) currentBucket = bucket
        else if (bucket > currentBucket) {
          // rotation: the finished bucket joins history exactly once
          if (!history.contains(currentBucket)) history += currentBucket
          out += notification(evs.head.timestamp)
          currentBucket = bucket
        } else if (bucket < currentBucket && !history.contains(bucket)) {
          // late events for a bucket that never passed through
          // currentBucket (it was empty until now): it is already a
          // finished bucket — insert into history in order so future
          // notifications include it and ACK GC can delete its file
          // (without this the file would be written but orphaned forever)
          val idx = history.indexWhere(_ > bucket)
          if (idx < 0) history += bucket else history.insert(idx, bucket)
        }
        // bucket < currentBucket: late arrival for an already-rotated
        // bucket — append to its existing file, no rotation/notify
        val lines = evs.map(eventJson).mkString("", "\n", "\n")
        Files.write(bucketPath(bucket), lines.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      }
    out.toSeq
  }

  private def notification(ts: Long): DatasetNotification = {
    val range = (history.takeRight(lastK)).toList
    val n = DatasetNotification(datasetId, s"$dir/buckets/$prefix", range, version, ts, range.size)
    datasetId += 1
    version += 1
    n
  }

  /** O6: ACK-based GC — delete buckets strictly older than the ACKed
    * range's start (Collector.java:139-166, 272-310).
    */
  def onAck(ack: AssemblyAck): Seq[Long] = {
    val keepFrom = ack.bucketsRange.headOption.getOrElse(return Nil)
    val (drop, keep) = history.partition(_ < keepFrom)
    drop.foreach(b => Files.deleteIfExists(bucketPath(b)))
    history.clear()
    history ++= keep
    drop.toSeq
  }

  /** O7 support: read a notification's buckets back into events (the
    * Factory's dataset assembly, ModelFactoryEngine.java:130-200).
    */
  def readDataset(n: DatasetNotification): Seq[CEvent] = {
    implicit val fmts: org.json4s.Formats = Json.formats
    n.bucketsRange.flatMap { b =>
      val p = Paths.get(s"${n.pathPrefix}$b")
      if (!Files.exists(p)) Seq.empty
      else Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map { line =>
        val j = Json.parse(line)
        CEvent(
          (j \ "id").extract[Long],
          (j \ "eventType").extract[String],
          (j \ "timestamp").extract[Long],
          (j \ "partition").extract[String],
          (j \ "num").extractOrElse[Map[String, Double]](Map.empty),
          (j \ "str").extractOrElse[Map[String, String]](Map.empty))
      }
    }
  }
}
