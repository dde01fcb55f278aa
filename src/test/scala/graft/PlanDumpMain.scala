package graft

/** Dump a registered query's executed-plan string (plan-audit helper):
  * `Test/runMain graft.PlanDumpMain <name> [sfDir] [outFile]`.
  */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val out = if (args.length > 2) args(2) else s"/tmp/plan_$name.txt"
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), plan)
    println(s"WROTE $out")
    spark.stop()
  }
}
