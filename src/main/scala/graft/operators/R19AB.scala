package graft.operators

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Round-19 interleaved A/B probe (throwaway — delete once SCALE.md
  * records the verdicts): arms alternate round-robin in ONE JVM so
  * ambient drift hits every variant equally (the ABProbe discipline,
  * but over code VARIANTS that are not registered gates).
  *
  *   freq_native vs freq_udaf — MisraGriesAgg (TypedImperativeAggregate)
  *     vs the udaf(Aggregator) bridge, on the q_sketch_freq aggregate
  *     shape (spread → groupBy(source) → MG over trigrams).
  *   bpe_native vs bpe_fold — the native BpeMergeStep linear pass vs
  *     the Catalyst `aggregate` HOF fold, on the full q_bpe_encode
  *     body. (A padded-containment GUARD on the fold was probed first
  *     and LOST every round — min 2.21 vs 2.00, medians 4.20 vs 3.12:
  *     the per-row condition outweighs the skipped work on this
  *     vocabulary — so the recovery is the native pass, not a guard.)
  */
object R19AB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = args.headOption.flatMap(_.toIntOption).getOrElse(5)
    val which = if (args.length > 1) args.drop(1).toSet else Set("freq", "bpe")
    val spark = GraftSession.localBuilder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    BoundedWindow.quietBoundedWarnings()

    def freqBody(native: Boolean): org.apache.spark.sql.DataFrame = {
      val grams = EventAnalytics.trigrams(spark, col("text"))
      val agg =
        if (native) graft.functions.FrequentItems.sketch(grams,
          EventAnalytics.FreqK)
        else graft.functions.FrequentItems.sketchUdaf(grams,
          EventAnalytics.FreqK)
      DedupOps.spread(Tables(spark, sfDir, "documents"))
        .groupBy(col("source")).agg(agg.as("mg"))
        .select(col("source"), col("mg.n").as("n"),
          size(map_keys(col("mg.items"))).as("n_items"))
    }

    def bpeBody(): org.apache.spark.sql.DataFrame =
      TextOps.bpeEncode(Tables(spark, sfDir, "documents"),
        TextOps.BpeTrainRounds)

    def withBloom(on: Boolean, q: String): org.apache.spark.sql.DataFrame = {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        on.toString)
      graft.SparkEntry.queries(q)(spark, sfDir)
    }

    val arms: Seq[(String, () => org.apache.spark.sql.DataFrame)] =
      (if (which("freq"))
        Seq("freq_native" -> (() => freqBody(true)),
          "freq_udaf" -> (() => freqBody(false)))
      else Nil) ++
      // bpe arm kept as a single-variant re-reader (the native-vs-fold
      // verdict is recorded; this remains for quiet-box re-pins)
      (if (which("bpe")) Seq("bpe_encode" -> (() => bpeBody())) else Nil) ++
      (if (which("bloom"))
        Seq("rerank_bloom" -> (() => withBloom(on = true, "q_sim_rerank_ivf")),
          "rerank_nobloom" -> (() => withBloom(on = false, "q_sim_rerank_ivf")))
      else Nil)

    def quiesce(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }

    val timings = arms.map { case (n, _) =>
      n -> scala.collection.mutable.ArrayBuffer.empty[Double]
    }
    arms.foreach { case (_, fn) => // untimed warmup
      fn().write.format("noop").mode("overwrite").save(); quiesce()
    }
    (1 to rounds).foreach { r =>
      arms.zip(timings).foreach { case ((n, fn), (_, buf)) =>
        quiesce()
        val t0 = System.nanoTime()
        fn().write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        buf += sec
        println(f"[ab] round $r $n $sec%.2f")
      }
    }
    timings.foreach { case (n, buf) =>
      val ts = buf.sorted
      val med =
        if (ts.length % 2 == 1) ts(ts.length / 2)
        else (ts(ts.length / 2 - 1) + ts(ts.length / 2)) / 2
      println(f"[ab] TOTAL $n min ${ts.head}%.2f med $med%.2f" +
        s" all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
