package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled","false").config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"===== $name")
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
