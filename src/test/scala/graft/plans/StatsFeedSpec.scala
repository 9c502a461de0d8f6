package graft.plans

import graft.SparkSpec
import graft.operators.Analytics
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** The ANALYZE loop closed: collected table statistics must CHANGE an
  * optimizer decision, not just sit in a gate result. The scenario is
  * the one streaming ingest actually produces — a dimension table
  * fragmented across many small files, whose on-disk footprint (the
  * optimizer's no-stats size estimate) is dominated by per-file
  * overhead and lands far above the logical data size. Without fed
  * stats the join sort-merges; after `Analytics.analyzeTable` the
  * row-count-based estimate fits under the broadcast threshold and
  * the SAME query plans a broadcast-hash join.
  */
class StatsFeedSpec extends SparkSpec {

  import spark.implicits._

  private def joinPlan(): SparkPlan = {
    val fact = (0L until 5000L).map(i => (i % 1000, i)).toDF("k", "v")
    fact.join(spark.table("stats_dim_frag"), Seq("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan
  }

  private def subtree(p: SparkPlan): Seq[SparkPlan] =
    p +: p.children.flatMap(subtree)

  test("fed ANALYZE stats flip a fragmented dimension join from " +
    "sort-merge to broadcast-hash; without stats it stays sort-merge") {
    // a 1000-row dimension fragmented into 64 files: logical size is
    // ~16 KB, on-disk size is dominated by 64 parquet footers
    (0L until 1000L).map(i => (i, i * 7)).toDF("k", "dim_payload")
      .repartition(64)
      .write.mode("overwrite").format("parquet")
      .saveAsTable("stats_dim_frag")
    val onDisk = spark.table("stats_dim_frag").inputFiles.map { f =>
      new java.io.File(new java.net.URI(f)).length
    }.sum
    // threshold sits BETWEEN the logical size and the disk footprint,
    // derived from the measured footprint so the test cannot rot if
    // parquet overhead shifts
    val threshold = onDisk / 2
    val logical = 1000L * (8 + 8 + 8)
    assert(logical < threshold,
      s"fixture broken: logical $logical !< threshold $threshold")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
    try {
      // WITHOUT stats: the estimate is the file-size sum -> too big
      val before = subtree(joinPlan())
      assert(before.exists(_.isInstanceOf[SortMergeJoinExec]) &&
        !before.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"no-stats plan should sort-merge (disk=$onDisk > $threshold):\n" +
          before.head)
      // feed OUR collected stats; the row-based estimate now fits
      Analytics.analyzeTable(spark, "stats_dim_frag")
      val after = subtree(joinPlan())
      assert(after.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"fed stats must flip the join to broadcast-hash:\n${after.head}")
      // and the fed stats are the collected truth, visible in the
      // catalog the way ANALYZE TABLE's would be
      val cat = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("stats_dim_frag"))
      val st = cat.stats.get
      assert(st.rowCount.contains(BigInt(1000)))
      assert(st.colStats("k").distinctCount.contains(BigInt(1000)))
      assert(st.colStats("k").min.contains("0") &&
        st.colStats("k").max.contains("999"))
      assert(st.colStats("dim_payload").nullCount.contains(BigInt(0)))
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS stats_dim_frag")
    }
  }

  test("fed stats size var-width columns by MEASURED bytes: a text-heavy " +
    "dimension is not wrongly flipped to broadcast by the 20-byte " +
    "string default") {
    // ~1 KB of poorly-compressible text per row: the dataType
    // defaultSize estimate (20 B/string) would claim ~72 KB for a
    // ~2 MB table and broadcast it — the inverse failure of the
    // fragmented-dimension case above
    val payload = (r: Long) => (0 until 64)
      .map(i => ((r * 131 + i * 7919) % 100000).toString).mkString(" ")
    (0L until 2000L).map(i => (i % 1000, payload(i)))
      .toDF("k", "text_payload")
      .write.mode("overwrite").format("parquet")
      .saveAsTable("stats_dim_text")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "500KB")
    try {
      Analytics.analyzeTable(spark, "stats_dim_text")
      val st = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("stats_dim_text"))
        .stats.get
      val avgLen = st.colStats("text_payload").avgLen.get
      assert(avgLen > 200, s"measured avgLen $avgLen is not the real width")
      assert(st.sizeInBytes > 500 * 1024,
        s"fed size ${st.sizeInBytes} must reflect measured row bytes")
      // the join must actually CARRY the text column — when the query
      // prunes it away, broadcasting the surviving 8-byte key column
      // is the right call and column pruning makes the estimate small
      // honestly
      // broadcasting the (genuinely small) fact side is fine; the
      // failure this pins is the DIM landing on the build side
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
      val fact = (0L until 5000L).map(i => (i % 1000, i)).toDF("k", "v")
      val plan = subtree(fact
        .join(spark.table("stats_dim_text"), Seq("k"))
        .groupBy(col("k"))
        .agg(max(length(col("text_payload"))).as("w"))
        .queryExecution.executedPlan)
      val dimBroadcast = plan.collect {
        case b: BroadcastExchangeExec if subtree(b).exists {
          case f: FileSourceScanExec =>
            f.tableIdentifier.exists(_.table == "stats_dim_text")
          case _ => false
        } => b
      }
      assert(dimBroadcast.isEmpty,
        s"text-heavy dim must never be the broadcast side:\n${plan.head}")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS stats_dim_text")
    }
  }

  test("append paths auto-maintain catalog stats: appends without a " +
    "manual ANALYZE keep the row-count estimate exact via observed " +
    "bumps, and growth past the refresh fraction triggers the full " +
    "re-analyze (baseline resets)") {
    import graft.operators.DedupOps
    import graft.sources.Sources
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    def physMeta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(
        Sources.physicalName(spark, "stats_band_auto")))
    try {
      // ingest bootstrap + ONE maintenance analyze = the lifecycle
      // gate's compaction pass; everything after runs unattended
      DedupOps.appendBandIndex(
        docs.filter(col("doc_id") < 100), "stats_band_auto", 4)
      Analytics.analyzeTable(spark, "stats_band_auto", exact = false)
      val analyzedAt = physMeta.stats.get.rowCount.get
      // small appends, NO manual ANALYZE: the observed-count bump
      // keeps the estimate exactly right after every single append
      Seq((100, 120), (120, 140)).foreach { case (lo, hi) =>
        DedupOps.appendBandIndex(
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
          "stats_band_auto", 4)
        val st = physMeta.stats.get
        assert(st.rowCount.contains(
          BigInt(spark.table("stats_band_auto").count())),
          s"row-count estimate drifted after append [$lo,$hi)")
      }
      // below the refresh fraction so far: still the original baseline
      assert(physMeta.properties("graft.stats.analyzedRows").toLong ==
        analyzedAt.toLong, "small appends must not re-analyze")
      // a growth burst past the fraction lands a FULL re-analyze:
      // baseline moves to the new truth, row count still exact
      DedupOps.appendBandIndex(
        docs.filter(col("doc_id") >= 140 && col("doc_id") < 400),
        "stats_band_auto", 4)
      val trueCount = spark.table("stats_band_auto").count()
      assert(physMeta.stats.get.rowCount.contains(BigInt(trueCount)))
      assert(physMeta.properties("graft.stats.analyzedRows").toLong ==
        trueCount,
        "growth past the refresh fraction must reset the analyze baseline")
    } finally Sources.dropVersioned(spark, "stats_band_auto")
  }
}
