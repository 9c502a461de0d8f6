package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The injectable materialization strategy: localCheckpoint locally;
  * under `spark.graft.clusterSafe=true` a lineage-keeping persist for
  * straight-line pins and a reliable checkpoint for loop-carried pins
  * — and, critically, identical operator RESULTS in every mode.
  */
class MaterializeSpec extends SparkSpec {

  import spark.implicits._

  /** Near-dup pair (0,1) plus an unrelated doc and an exact twin pair
    * (3,4) — enough structure for nontrivial clusters. */
  private def docs: DataFrame = {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok7", "changed")
    val other = (1 to 40).map(i => s"other$i").mkString(" ")
    val twin = (1 to 40).map(i => s"twin$i").mkString(" ")
    Seq((0L, base), (1L, nearDup), (2L, other), (3L, twin), (4L, twin))
      .toDF("doc_id", "text")
  }

  private def inClusterSafe[A](body: => A): A = {
    spark.conf.set(Materialize.ClusterSafeKey, "true")
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.conf.set(Materialize.CheckpointDirKey,
        java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
    try body
    finally {
      spark.conf.unset(Materialize.ClusterSafeKey)
      spark.catalog.clearCache()
    }
  }

  test("pin localCheckpoints by default, persists under clusterSafe") {
    val base = spark.range(10).toDF("x")
    val local = Materialize.pin(base)
    // localCheckpoint returns a NEW frame over the materialized blocks
    assert(!(local eq base))
    assert(local.queryExecution.analyzed.getClass.getSimpleName == "LogicalRDD")
    inClusterSafe {
      val df = spark.range(10).toDF("x")
      val safe = Materialize.pin(df)
      // persist pins in place: same frame, lineage preserved, cached
      assert(safe eq df)
      assert(safe.storageLevel == StorageLevel.MEMORY_AND_DISK)
      Materialize.unpin(safe)
      assert(safe.storageLevel == StorageLevel.NONE)
    }
  }

  test("pinIter truncates lineage in BOTH modes (loop plans must not nest rounds)") {
    val local = Materialize.pinIter(spark.range(10).toDF("x"))
    assert(local.queryExecution.analyzed.getClass.getSimpleName == "LogicalRDD")
    inClusterSafe {
      val safe = Materialize.pinIter(spark.range(10).toDF("x"))
      // reliable checkpoint: flat plan AND durable storage, unlike persist
      assert(safe.queryExecution.analyzed.getClass.getSimpleName == "LogicalRDD")
      assert(safe.count() == 10)
      assert(spark.sparkContext.getCheckpointDir.nonEmpty)
    }
  }

  test("unpin deletes a superseded reliable checkpoint's files " +
    "(clusterSafe loops must not leak every round to durable storage)") {
    inClusterSafe {
      val ck = Materialize.pinIter(spark.range(10).toDF("x"))
      val file = ck.queryExecution.analyzed
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
        .rdd.getCheckpointFile.get
      val path = new org.apache.hadoop.fs.Path(file)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(path))
      Materialize.unpin(ck)
      assert(!fs.exists(path))
    }
  }

  test("unpin is a no-op for localCheckpoint pins") {
    val local = Materialize.pin(spark.range(5).toDF("x"))
    Materialize.unpin(local) // must not throw or invalidate the blocks
    assert(local.count() == 5)
  }

  test("cluster-safe mode yields identical dedup clusters (iterated pins + unpins)") {
    def run(): Seq[(Long, Long)] =
      MinLabelClusters.dupClusters(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val local = run()
    val safe = inClusterSafe(run())
    assert(local == safe)
    assert(local.toMap == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 3L, 4L -> 3L))
  }

  test("cluster-safe mode yields identical corpus rarity scores (straight-line pins)") {
    def run(): Seq[String] =
      graft.SparkEntry.queries("q_text_rarity")(spark, "/root/testdata/sf0.001")
        .collect().map(_.toString).toSeq.sorted
    assert(run() == inClusterSafe(run()))
  }

  test("cluster-safe mode yields identical dsir weights (pinned n-gram buckets)") {
    def run(): Seq[String] =
      graft.SparkEntry.queries("q_select_dsir")(spark, "/root/testdata/sf0.001")
        .collect().map(_.toString).toSeq.sorted
    assert(run() == inClusterSafe(run()))
  }

  test("cluster-safe mode yields identical star components") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    def run(): Seq[(Long, Long)] = // -1: the distributed rounds ARE the
      // pin machinery under test here — don't let the local finish skip them
      DedupOps.starComponents(pairs, localFinishEdges = -1).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(run() == inClusterSafe(run()))
  }
}
