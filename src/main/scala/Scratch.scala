import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("""select split('abc','') as s, ascii('') as a0,
      aggregate(split('abc',''), 0L, (a,c) -> (a*31 + ascii(c)) % 1000000007) as h,
      shiftright(5L,1) as sr, 5 % 3 as m, md5('hello') as md,
      aggregate(zip_with(array(1.5D,2.5D), array(3.25D,4.5D), (x,y)->x*y), 0D, (a,b)->a+b) as dot
      """).show(false)
    spark.stop()
  }
}
