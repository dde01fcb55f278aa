package graft.cef

import graft.cef.spark.{Detect, EventStream, NEvent}
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions.col
import scala.util.Random

/** Is the BATCH per-key scan worth the narrow treatment too? The batch
  * path (Detect.perKeyScan) pays Catalyst's Map decode ONCE per row
  * (the streaming path paid it 2-3x around the keyed state exchange,
  * which is why round 13 narrowed it). Measures batch detections over
  * the same 4M-event corpus both ways; the result decides whether a
  * batch EventStream API is signal or churn.
  */
object BatchNarrowProbeMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 4000000
    val spark = SparkSession.builder().master("local[8]")
      .appName("batch-narrow-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val cp = Compiler.compile(
      ";(IsEventTypePredicate(a),+(IsEventTypePredicate(b),IsEventTypePredicate(c)),GTPredicate(value,100.0))")
    val types = Array("a", "b", "c", "d")
    val dir = graft.queries.StreamScaffold.newScaffoldDir("graft-batchprobe")
    spark.range(0, n).map { i =>
      val r = new Random(i)
      (i, types(r.nextInt(4)), i, s"u${i % 32}", r.nextInt(200).toDouble)
    }.toDF("event_id", "event_type", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(dir.toString)
    val df = spark.read.parquet(dir.toString)

    def toEv(d: DataFrame) = Detect.toEvents(d, "event_id", "event_type",
      "ts", "user_id", numAttrs = Seq("value"))
    def toES(d: DataFrame) = Detect.toEventStream(d, "event_id", "event_type",
      "ts", "user_id", numAttrs = Seq("value"))

    // narrow batch prototype: same repartition+sort+mapPartitions shape
    // as perKeyScan, CEvent rebuilt once per row from NEvent
    def detectionsNarrow(es: EventStream) = {
      implicit val detEnc: Encoder[Detection] = Encoders.product[Detection]
      es.ds
        .repartition(col("partition"))
        .sortWithinPartitions(col("partition"), col("timestamp"), col("id"))
        .mapPartitions { rows =>
          var currentKey: String = null
          var run: DetRun = null
          rows.flatMap { ne =>
            val e = es.rebuild(ne)
            if (e.partition != currentKey) {
              currentKey = e.partition
              run = new DetRun(cp, currentKey)
            }
            run.step(e).iterator
          }
        }
    }

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val c = f; ((System.nanoTime() - t0) / 1e9, c)
      }
      val best = ts.map(_._1).min
      println(f"BATCH $label%-28s best ${best}%6.2f s  (${n / best / 1e6}%5.2f M ev/s, ${ts.head._2} detections)")
    }

    time("detections CEvent")(Detect.detections(toEv(df), cp).count())
    time("detections narrow")(detectionsNarrow(toES(df)).count())
    spark.stop()
  }
}
