package graft
import org.apache.spark.sql.SparkSession

/** Scratch tool (r16): dump .explain("formatted") for queries to a dir.
  * Usage: PlanDump <sfDir> <outDir> [nameRegex]
  * Not part of the driver contract; delete before round close if unused.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    graft.queries.StreamScaffold.sweepStale()
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val re = if (args.length > 2) args(2) else ".*"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.Release.sweepStart(spark)
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if name.matches(re)) {
      graft.ops.Release.beginQuery(name)
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"$name.txt"),
          txt.getBytes("UTF-8"))
      } catch {
        case e: Throwable =>
          java.nio.file.Files.write(outDir.resolve(s"$name.ERR.txt"),
            s"${e.getClass.getName}: ${e.getMessage}".getBytes("UTF-8"))
      }
      graft.ops.Release.queryFinished(spark, name)
    }
    spark.stop()
  }
}
