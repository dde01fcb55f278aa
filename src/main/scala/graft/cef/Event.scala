package graft.cef

/** The single record type flowing through the CEF engine.
  *
  * Mirrors the reference's GenericEvent (reference:
  * Wayeb/cef/src/main/scala/stream/GenericEvent.scala:59-95): a monotone id,
  * an event type, an epoch timestamp and an open attribute bag. We split the
  * bag into a numeric and a string map so the case class has a cheap Spark
  * Encoder (Map[String,Any] has none) and predicate evaluation needs no
  * per-event parsing.
  *
  * Virtual attributes Id / EventType / Timestamp short-circuit to the typed
  * fields, as in the reference (GenericEvent.scala:88-95).
  *
  * @param id        monotone per-source counter (event_id in the testdata)
  * @param eventType the event type string
  * @param timestamp epoch time (micros in our Spark layer; the engine only
  *                  compares/diffs, so any fixed unit works)
  * @param partition value of the partition attribute ("" when unpartitioned)
  * @param num       numeric attributes
  * @param str       string attributes
  */
final case class CEvent(
    id: Long,
    eventType: String,
    timestamp: Long,
    partition: String,
    num: Map[String, Double],
    str: Map[String, String]) {

  def numberOf(attr: String): Double = attr match {
    case "Id"        => id.toDouble
    case "Timestamp" => timestamp.toDouble
    case _ =>
      num.getOrElse(attr,
        str.get(attr).map(_.toDouble).getOrElse(
          throw new NoSuchElementException(s"no numeric attribute '$attr' on event $id")))
  }

  def stringOf(attr: String): String = attr match {
    case "Id"        => id.toString
    case "EventType" => eventType
    case "Timestamp" => timestamp.toString
    case _ =>
      str.getOrElse(attr, num.get(attr).map(_.toString).getOrElse(
        throw new NoSuchElementException(s"no attribute '$attr' on event $id")))
  }

  /** Reset sentinel: returns every run to its start state and clears buffers
    * (reference: stream/GenericEvent.scala ResetEvent; timestamp == -1 in CSV).
    */
  def isReset: Boolean = eventType == CEvent.ResetType
}

object CEvent {
  val ResetType = "__RESET__"

  def reset(partition: String): CEvent =
    CEvent(-1L, ResetType, -1L, partition, Map.empty, Map.empty)

  /** Convenience constructor for tests: type + timestamp only (the shape of
    * the reference's generic CSV stream, GenericCSVLineParser.scala:7-24). */
  def simple(id: Long, tpe: String, ts: Long): CEvent =
    CEvent(id, tpe, ts, "", Map.empty, Map.empty)
}
