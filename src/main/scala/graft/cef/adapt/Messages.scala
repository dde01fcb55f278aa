package graft.cef.adapt

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The adaptation loop's message contracts, JSON-compatible with the
  * reference's Kafka topics (SURVEY.md §0 topic table):
  *
  *   observer_instructions — Observer→Controller (ObserverProcess.java:128-160)
  *   factory_commands      — Controller→Factory  (optimizer.py:187-240)
  *   model_reports         — Factory→Controller+Engine
  *   enginesync            — Controller→Engine   (sync.py:14-48)
  *   dataset_versions      — Collector→Factory   (Collector.java:245-270)
  *   assembly_reports      — Factory→Collector ACK
  */
object Json {
  implicit val formats: Formats = DefaultFormats

  def render(fields: (String, Any)*): String = {
    def j(v: Any): JValue = v match {
      case null            => JNull
      case s: String       => JString(s)
      case i: Int          => JInt(i)
      case l: Long         => JInt(l)
      case d: Double       => JDouble(d)
      case b: Boolean      => JBool(b)
      case m: Map[_, _]    => JObject(m.toList.map { case (k, x) => k.toString -> j(x) })
      case xs: Seq[_]      => JArray(xs.toList.map(j))
      case o: JValue       => o
    }
    JsonMethods.compact(JsonMethods.render(JObject(fields.toList.map { case (k, v) => k -> j(v) })))
  }

  def parse(s: String): JValue = JsonMethods.parse(s)
}

/** Observer → Controller (instruction_type: optimize | retrain). */
final case class Instruction(
    id: Int,
    timestamp: Long,
    instructionType: String,
    modelId: String,
    metrics: Map[String, Double]) {
  def toJson: String = Json.render(
    "id" -> id, "timestamp" -> timestamp,
    "instruction_type" -> instructionType, "model_id" -> modelId,
    "instruction" -> instructionType, // legacy alias, ObserverProcess.java:146
    "metrics" -> metrics)
}

object Instruction {
  def fromJson(s: String): Instruction = {
    implicit val fmts: Formats = Json.formats
    val j = Json.parse(s)
    Instruction(
      (j \ "id").extract[Int],
      (j \ "timestamp").extract[Long],
      (j \ "instruction_type").extract[String],
      (j \ "model_id").extractOrElse[String](""),
      (j \ "metrics").extractOrElse[Map[String, Double]](Map.empty))
  }
}

/** Controller → Factory (optimizer.py command builders:187-240).
  * `params` carries a nested JSON string, exactly like the reference.
  */
final case class FactoryCommand(
    cmdType: String, // train | opt_initialise | opt_step | opt_finalise
    id: String,
    trainId: Int,
    optimisationId: Int,
    timestamp: Long,
    params: Option[List[Double]], // [pMin, gamma]
    bestI: Int) {
  def toJson: String = {
    val inner = params match {
      case Some(ps) => Json.render("params" -> ps)
      case None     => """{"params": null}"""
    }
    Json.render(
      "type" -> cmdType, "id" -> id, "train_id" -> trainId,
      "optimisation_id" -> optimisationId, "timestamp" -> timestamp,
      "params" -> inner, "best_i" -> bestI)
  }
}

object FactoryCommand {
  def fromJson(s: String): FactoryCommand = {
    implicit val fmts: Formats = Json.formats
    val j = Json.parse(s)
    val inner = Json.parse((j \ "params").extract[String]) \ "params"
    val ps = inner match {
      case JArray(xs) => Some(xs.map(_.extract[Double]))
      case _          => None
    }
    FactoryCommand(
      (j \ "type").extract[String],
      (j \ "id").extract[String],
      (j \ "train_id").extract[Int],
      (j \ "optimisation_id").extract[Int],
      (j \ "timestamp").extract[Long],
      ps,
      (j \ "best_i").extract[Int])
  }
}

/** Engine sync commands (sync.py:14-48). model_id == -1 means none. */
final case class SyncCommand(cmdType: String, timestamp: Long, modelId: Int) {
  def toJson: String =
    Json.render("type" -> cmdType, "timestamp" -> timestamp, "model_id" -> modelId)
}

object SyncCommand {
  def pause(ts: Long): SyncCommand = SyncCommand("pause", ts, -1)
  def play(ts: Long, modelId: Int): SyncCommand = SyncCommand("play", ts, modelId)
  def fromJson(s: String): SyncCommand = {
    implicit val fmts: Formats = Json.formats
    val j = Json.parse(s)
    SyncCommand(
      (j \ "type").extract[String],
      (j \ "timestamp").extract[Long],
      (j \ "model_id").extract[Int])
  }
}

/** Factory → Controller/Engine model report
  * (ModelFactoryEngine.java:249-512 report emission). */
final case class FactoryReport(
    replyId: String,
    reportType: String, // trained | opt_step_done | opt_finalised | error
    modelId: Int,
    modelPath: String,
    metrics: Map[String, Double]) {
  def toJson: String = Json.render(
    "reply_id" -> replyId, "report_type" -> reportType,
    "model_id" -> modelId, "model_path" -> modelPath, "metrics" -> metrics)
}

object FactoryReport {
  def fromJson(s: String): FactoryReport = {
    implicit val fmts: Formats = Json.formats
    val j = Json.parse(s)
    FactoryReport(
      (j \ "reply_id").extract[String],
      (j \ "report_type").extract[String],
      (j \ "model_id").extractOrElse[Int](-1),
      (j \ "model_path").extractOrElse[String](""),
      (j \ "metrics").extractOrElse[Map[String, Double]](Map.empty))
  }
}

/** Collector → Factory dataset notification (Collector.java:245-270). */
final case class DatasetNotification(
    datasetId: Int,
    pathPrefix: String,
    bucketsRange: List[Long], // last-K bucket ids, ascending
    version: Int,
    timestamp: Long,
    bucketCount: Int) {
  def toJson: String = Json.render(
    "dataset_id" -> datasetId, "path_prefix" -> pathPrefix,
    "buckets_range" -> bucketsRange, "version" -> version,
    "timestamp" -> timestamp, "bucket_count" -> bucketCount)
}

object DatasetNotification {
  def fromJson(s: String): DatasetNotification = {
    implicit val fmts: Formats = Json.formats
    val j = Json.parse(s)
    DatasetNotification(
      (j \ "dataset_id").extract[Int],
      (j \ "path_prefix").extract[String],
      (j \ "buckets_range").extract[List[Long]],
      (j \ "version").extract[Int],
      (j \ "timestamp").extract[Long],
      (j \ "bucket_count").extract[Int])
  }
}

/** Factory → Collector assembly ACK (Collector.java:139-166). */
final case class AssemblyAck(datasetId: Int, version: Int, bucketsRange: List[Long]) {
  def toJson: String = Json.render(
    "dataset_id" -> datasetId, "version" -> version, "buckets_range" -> bucketsRange)
}

object AssemblyAck {
  def fromJson(s: String): AssemblyAck = {
    implicit val fmts: Formats = Json.formats
    val j = Json.parse(s)
    AssemblyAck(
      (j \ "dataset_id").extract[Int],
      (j \ "version").extract[Int],
      (j \ "buckets_range").extract[List[Long]])
  }
}
