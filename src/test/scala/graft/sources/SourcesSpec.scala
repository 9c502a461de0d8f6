package graft.sources

import graft.SparkSpec
import graft.imdb.{ImdbDataset, Pimdb}
import org.apache.spark.sql.functions._

/** Source/sink surface: the JDBC round trip against embedded Derby
  * (the in-container SQL database) and bucketed tables eliminating
  * the join shuffle.
  */
class SourcesSpec extends SparkSpec {

  import spark.implicits._

  private val derbyUrl = "jdbc:derby:memory:graftdb;create=true"

  test("ETL to SQL DB: transfer+build land in Derby and read back intact") {
    val dataDir = getClass.getResource("/imdb").getPath
    val pimdb = Pimdb(spark)
    pimdb.transfer(dataDir, Seq(ImdbDataset.TitleRatings, ImdbDataset.TitleBasics))
    pimdb.writeToJdbc(derbyUrl)
    val back = Sources.readJdbc(spark, derbyUrl, "TitleRatings")
    assert(back.count() == 12)
    val row = back.filter($"tconst" === "tt2535470").collect()
    assert(row.length == 1)
    assert(row(0).getAs[Int]("numVotes") > 0)
    assert(Sources.readJdbc(spark, derbyUrl, "TitleBasics").count() == 75)
  }

  test("generic format round trip: json and orc") {
    val df = graft.Tables(spark, "/root/testdata/sf0.001", "nation")
    Seq("json", "orc").foreach { fmt =>
      val path = java.nio.file.Files.createTempDirectory(s"graft_$fmt").toString
      Sources.write(df, fmt, path)
      val back = Sources.read(spark, fmt, path,
        schema = if (fmt == "json") Some(df.schema) else None)
      assert(back.count() == 25, fmt)
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val o = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
    val l = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
    Sources.writeBucketed(o.withColumnRenamed("o_orderkey", "k"),
      "b_orders", Seq("k"), 4)
    Sources.writeBucketed(l.withColumnRenamed("l_orderkey", "k"),
      "b_lineitem", Seq("k"), 4)
    val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "k")
      .groupBy("k").agg(count(lit(1)).as("n"))
    // disable broadcast so the join would otherwise be a shuffle SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
