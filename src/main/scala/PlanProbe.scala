/** Dev runner: prints the join/exchange/scan skeleton of the named
  * queries' physical plans at sf0.001 — the quick "is this the plan I
  * want" read before PlanSpec pins it. Usage: runMain PlanProbe <query...>
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Window") ||
          l.contains("Cartesian") || l.contains("Scan") || l.contains("Aggregate"))
        .map(_.take(150)).mkString("\n"))
    }
    spark.stop()
  }
}
