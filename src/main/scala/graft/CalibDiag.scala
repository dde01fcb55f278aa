package graft
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (r16): why does the fixed calibration probe slow
  * down over a sweep? Probes before/after running the query surface at
  * sf0.01, then after successive cleanup attempts. Delete when solved.
  */
object CalibDiag {
  def main(args: Array[String]): Unit = {
    graft.queries.StreamScaffold.sweepStale()
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def probe(): Double = {
      val t0 = System.nanoTime()
      spark.range(10000000L)
        .selectExpr("id % 1000 AS k", "id AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("s"))
        .agg(org.apache.spark.sql.functions.sum("s")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def probes(tag: String, n: Int = 6): Unit = {
      val ts = (1 to n).map(_ => probe())
      println(f"PROBE $tag%-28s min ${ts.min}%.3f med ${ts.sorted.apply(n/2)}%.3f max ${ts.max}%.3f")
    }
    probes("fresh")
    graft.ops.Release.sweepStart(spark)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    var done = 0
    for ((name, fn) <- ordered) {
      graft.ops.Release.beginQuery(name)
      try fn(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[diag] $name: ${e.getMessage}") }
      graft.ops.Release.queryFinished(spark, name)
      done += 1
      if (done % 51 == 0) probes(s"after $done queries", 3)
    }
    probes("after all queries")
    spark.sqlContext.clearCache()
    probes("after clearCache")
    spark.catalog.clearCache()
    for (t <- spark.catalog.listTables().collect())
      spark.catalog.dropTempView(t.name)
    probes("after dropping temp views")
    System.gc(); Thread.sleep(2000)
    probes("after System.gc")
    // new session, same context
    val s2 = spark.newSession()
    def probe2(): Double = {
      val t0 = System.nanoTime()
      s2.range(10000000L)
        .selectExpr("id % 1000 AS k", "id AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("s"))
        .agg(org.apache.spark.sql.functions.sum("s")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val t2 = (1 to 6).map(_ => probe2())
    println(f"PROBE newSession                  min ${t2.min}%.3f med ${t2.sorted.apply(3)}%.3f max ${t2.max}%.3f")
    spark.stop()
  }
}
