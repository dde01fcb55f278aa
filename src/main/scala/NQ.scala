/** Dev runner: the verify skill's fast single-query loop. Writes the
  * named queries' results + their oracle JSON so check_oracle.py can
  * compare just those (~40 s instead of the full 153-query gate).
  * Usage: runMain NQ <sfDir> <outDir> <query...>
  */
object NQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args.drop(2)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    for (n <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, args(0)).coalesce(1)
        .write.mode("overwrite").parquet(s"${args(1)}/$n")
      println(f"TIMING $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val json = names.map(n => s"${q(n)}: ${q(graft.SparkEntry.oracleSql(n))}")
      .mkString("{", ", ", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"${args(1)}/oracle_sql.json"), json)
    spark.stop()
  }
}
