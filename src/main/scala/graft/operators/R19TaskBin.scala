package graft.operators

import graft.{GraftSession, SparkEntry}

/** Round-19 attribution probe (throwaway): which gate emits the
  * 2.1→5.2 MiB "Broadcasting large task binary" crescendo in the
  * BENCH_r18 tail? Runs each named query (default: the r18 contended
  * nine, whose sweep-end re-measurement is where the tail's
  * timestamps point) between stdout markers with ONLY the
  * DAGScheduler logger at WARN, so every large-task-binary line lands
  * between the markers of the query that caused it.
  */
object R19TaskBin {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_profile", "q_rollup", "q_sample_reservoir",
        "q_sample_split", "q_session_window", "q_shuffle_global",
        "q_sim_binary", "q_sim_bm25", "q_sim_cosine_topk")
    var builder = GraftSession.localBuilder(cpus)
    // optional dissection confs: SPARK_GRAFT_PROBE_CONF="k=v,k=v"
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach(_.split(',')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder = builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    BoundedWindow.quietBoundedWarnings()
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.DAGScheduler",
      org.apache.logging.log4j.Level.WARN)
    if (names == Seq("dump")) {
      // serialize each piece's physical RDD the way task dispatch does
      // and dump to /tmp for object-graph archaeology (strings | uniq)
      SimilarityOps.r19IndexPieces(spark, sfDir).foreach { case (n, df) =>
        val rdd = df.queryExecution.toRdd
        val bos = new java.io.ByteArrayOutputStream()
        val oos = new java.io.ObjectOutputStream(bos)
        oos.writeObject(rdd)
        oos.close()
        val arr = bos.toByteArray
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"/tmp/taskbin_$n.bin"), arr)
        println(s"[taskbin] DUMP $n ${arr.length} bytes")
      }
      spark.stop()
      return
    }
    val pieces: Seq[(String, () => org.apache.spark.sql.DataFrame)] =
      if (names == Seq("dissect"))
        SimilarityOps.r19IndexPieces(spark, sfDir)
          .map { case (n, df) => (n, () => df) }
      else names.map(n =>
        (n, () => SparkEntry.queries(n)(spark, sfDir)))
    pieces.foreach { case (n, fn) =>
      println(s"[taskbin] BEGIN $n")
      Console.out.flush()
      try fn().write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        println(s"[taskbin] $n FAILED ${e.getMessage}")
      }
      Console.out.flush()
      System.err.flush()
      println(s"[taskbin] END $n")
      System.gc()
    }
    spark.stop()
  }
}
