package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query and
  * total wall-clock seconds.
  *
  * Each query is forced through the `noop` sink — unlike `count()`,
  * which lets Spark prune the whole projection away, noop materializes
  * every output row and column, so the timing covers the real work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up JVM/JIT, codegen and parquet footers once, untimed
    Tables.names.foreach(n =>
      try Tables(spark, sfDir, n).limit(1).write.format("noop")
        .mode("overwrite").save()
      catch { case _: Throwable => () })
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      // isolate queries from each other: drop checkpointed/cached RDD
      // blocks, stop any straggling streams, and settle the heap so
      // one query's garbage isn't billed to the next
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // best-effort: stop() can throw/time out on a wedged stream and
      // must not lose the already-collected timings
      try spark.streams.active.foreach(_.stop())
      catch { case _: Throwable => () }
      System.gc()
      name -> (if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
