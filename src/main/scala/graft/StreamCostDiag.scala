package graft
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (r16): per-micro-batch duration breakdown of the
  * streaming gates via StreamingQueryProgress. Delete when done.
  */
object StreamCostDiag {
  def main(args: Array[String]): Unit = {
    graft.queries.StreamScaffold.sweepStale()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("cef54_streaming_sessions", "cef52_streaming_hll", "cef37_streaming_join")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.Release.sweepStart(spark)
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        println(s"START ${e.name} at ${System.nanoTime()/1000000}ms")
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"BATCH ${p.name} b=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        println(s"TERM at ${System.nanoTime()/1000000}ms")
    })
    for (n <- names; rep <- 1 to 2) {
      graft.ops.Release.beginQuery(n)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.ops.Release.queryFinished(spark, n)
      println(f"TOTAL $n rep$rep $dt%.2f s")
    }
    spark.stop()
  }
}
