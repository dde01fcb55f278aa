package graft
import org.apache.spark.sql.SparkSession

/** Scratch (r16): split query time into plan-construction (analysis→
  * executedPlan) vs execution for selected queries. Delete when done.
  */
object PlanTimeDiag {
  def main(args: Array[String]): Unit = {
    graft.queries.StreamScaffold.sweepStale()
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.ops.Release.sweepStart(spark)
    for (n <- names; rep <- 1 to 3) {
      graft.ops.Release.beginQuery(n)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      graft.ops.Release.queryFinished(spark, n)
      println(f"PT $n rep$rep build ${(t1-t0)/1e9}%6.2f plan ${(t2-t1)/1e9}%6.2f exec ${(t3-t2)/1e9}%6.2f")
    }
    spark.stop()
  }
}
