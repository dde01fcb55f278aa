package graft

/** Dump a registered query's POST-EXECUTION plan (AQE final) — the r16
  * plan_shape_audit counted join nodes in the pre-execution explain,
  * where every AdaptiveSparkPlan is still `isFinalPlan=false` and AQE's
  * runtime SMJ→BHJ/SHJ rewrites are invisible. This runner executes the
  * query first (count), then prints the executed plan, which for AQE
  * plans is the final re-optimized one.
  *
  * `Test/runMain graft.FinalPlanDumpMain <sfDir> <outDir> <name>...`
  */
object FinalPlanDumpMain {
  def main(args: Array[String]): Unit = {
    graft.queries.StreamScaffold.sweepStale()
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val names = args.drop(2).toSeq
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.Release.sweepStart(spark)
    for (n <- names) {
      graft.ops.Release.beginQuery(n)
      val df = SparkEntry.queries(n)(spark, sfDir)
      // collect(), NOT count(): count() builds its own QueryExecution and
      // leaves df's plan unexecuted (isFinalPlan stays false)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      graft.ops.Release.queryFinished(spark, n)
      java.nio.file.Files.writeString(outDir.resolve(s"$n.txt"), plan)
      // count join nodes in the FINAL section only (the AQE string
      // prints "== Final Plan ==" then "== Initial Plan ==")
      val finalPart = plan.split("== Initial Plan ==").head
      val smj = "SortMergeJoin".r.findAllIn(finalPart).size
      val bhj = "BroadcastHashJoin".r.findAllIn(finalPart).size
      val shj = "ShuffledHashJoin".r.findAllIn(finalPart).size
      println(s"FINALPLAN $n SMJ=$smj BHJ=$bhj SHJ=$shj")
    }
    spark.stop()
  }
}
