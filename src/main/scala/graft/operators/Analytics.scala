package graft.operators

import graft.{QueryDef, Tables}
import graft.operators.Materialize.PinOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic functions beyond the reference's own surface (SURVEY
  * marks A6/W5/E3 "absent in reference — free via Spark SQL"): exact
  * percentiles, the full window-analytics family, ordered collection
  * aggregates, correlation/stddev, and CUBE grouping sets. These are
  * the operators a pimdb user gains by switching — each still
  * oracle-checked against DuckDB.
  */
object Analytics {

  val all: Seq[QueryDef] = Seq(

    // Exact interpolated percentiles per group (same (n-1)*p linear
    // interpolation in Spark's percentile and DuckDB's quantile_cont).
    QueryDef.sql(
      "q_percentile",
      """SELECT l_returnflag,
        |       round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        |       round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        |       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(percentile(col("l_quantity"), lit(0.5)), 6).as("p50_qty"),
            round(percentile(col("l_quantity"), lit(0.9)), 6).as("p90_qty"),
            round(percentile(col("l_extendedprice"), lit(0.95)), 4)
              .as("p95_price"))
    },

    // Per-source token-length quartiles, EXACT and engine-portable:
    // both engines pick the value at row_number rank
    // ((n-1)·q) div 100 + 1 in (len)-sorted order — discrete
    // (type-1/quantile_disc-style) selection in pure integer
    // arithmetic, so no interpolation convention can diverge. The
    // data-card companion q_corpus_card's mean hides tails; releases
    // report these. Scale: the window sorts (source, len) PAIRS —
    // ~16 bytes/doc, never text — and q_approx_quantile remains the
    // one-pass sketch path when even that sort is too much.
    QueryDef.sql(
      "q_length_quartiles",
      """WITH l AS (SELECT source, len(string_split(text, ' ')) AS len
        |           FROM documents),
        |r AS (SELECT source, len,
        |             row_number() OVER (PARTITION BY source ORDER BY len) AS rn,
        |             count(*) OVER (PARTITION BY source) AS n
        |      FROM l)
        |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
        |       CAST(min(CASE WHEN rn = (n-1)*25//100 + 1 THEN len END) AS BIGINT) AS p25_tokens,
        |       CAST(min(CASE WHEN rn = (n-1)*50//100 + 1 THEN len END) AS BIGINT) AS p50_tokens,
        |       CAST(min(CASE WHEN rn = (n-1)*75//100 + 1 THEN len END) AS BIGINT) AS p75_tokens,
        |       CAST(max(len) AS BIGINT) AS max_tokens
        |FROM r GROUP BY source""".stripMargin) {
      (s, dir) => lengthQuartiles(Tables(s, dir, "documents"))
    },

    // The analytic-window family: lag/lead, dense_rank, percent_rank,
    // ntile, first_value over a deterministic per-customer ordering.
    QueryDef.sql(
      "q_window_analytics",
      """SELECT o_custkey, o_orderkey,
        |       lag(o_orderkey) OVER w AS prev_ok,
        |       lead(o_orderkey) OVER w AS next_ok,
        |       CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |       round(percent_rank() OVER w, 6) AS prnk,
        |       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |       first_value(o_orderkey) OVER w AS best_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_ok"),
          lead(col("o_orderkey"), 1).over(w).as("next_ok"),
          dense_rank().over(w).as("drnk"),
          round(percent_rank().over(w), 6).as("prnk"),
          ntile(4).over(w).as("quartile"),
          first_value(col("o_orderkey")).over(w).as("best_ok"))
    },

    // Ordered collection + statistical aggregates. The collected set
    // is sorted before stringification so both engines agree.
    QueryDef.sql(
      "q_agg_extras",
      """SELECT l_returnflag,
        |       array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
        |       round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
        |       round(stddev_samp(l_quantity), 4) AS qty_stddev
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            array_join(sort_array(collect_set(col("l_linestatus"))), ",")
              .as("statuses"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 4)
              .as("qty_price_corr"),
            round(stddev_samp(col("l_quantity")), 4).as("qty_stddev"))
    },

    // Same result as q_window_rank but via the BOUNDED top-k
    // aggregator (graft.functions.TopK): shuffles k rows per
    // (partition, key) instead of every group row — the scale path
    // for top-k-per-key. Oracle: the window formulation.
    QueryDef.sql(
      "q_topk_per_key",
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |      FROM orders) WHERE rnk <= 3""".stripMargin) {
      (s, dir) =>
        graft.functions.TopK
          .perKey(Tables(s, dir, "orders"),
            "o_custkey", "o_totalprice", "o_orderkey", 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("rnk"))
    },

    // Typed UDAF surface: deterministic bottom-k reservoir sample per
    // group (graft.functions.ReservoirSample). The sample MEMBERSHIP
    // is engine-private (hash priorities), so the hashed output
    // carries what IS oracle-checkable: the exact group size, the
    // sample size (= least(k, n) for a correct reservoir), and a
    // validity flag proving the sample is duplicate-free and every
    // element joins back to its own group. DuckDB computes the same
    // exact columns and asserts TRUE; partition-invariance and
    // determinism of the membership stay spec-pinned
    // (PipelineOpsSpec). The audit join ships only sampled keys —
    // O(groups·k) rows — never the corpus.
    QueryDef.sql(
      "q_sample_reservoir",
      """SELECT o_orderstatus,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(least(5, count(*)) AS INTEGER) AS sample_size,
        |       TRUE AS sample_valid
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      // pinned: base feeds the reservoir agg AND the audit join-back;
      // agg feeds the explode probe AND the final projection — without
      // pins each consumer rescans orders / re-runs the aggregate
      val base = Tables(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey").cast("string").as("ok"))
        .pinned
      val agg = base.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          // native TypedImperativeAggregate (value-identical to the
          // udaf form by determinism, spec-pinned) — no per-row
          // encoder bridge on the corpus-sized input
          graft.functions.ReservoirSample(s, col("ok"), 5).as("sample"))
        .pinned
      val matched = agg
        .select(col("o_orderstatus"), explode(col("sample")).as("ok"))
        .join(base, Seq("o_orderstatus", "ok"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n_matched"))
      agg.join(matched, Seq("o_orderstatus"), "left_outer")
        .select(col("o_orderstatus"), col("n_orders"),
          size(col("sample")).as("sample_size"),
          (size(col("sample")) === least(lit(5L), col("n_orders")).cast("int")
            && size(array_distinct(col("sample"))) === size(col("sample"))
            && coalesce(col("n_matched"), lit(0L))
              === size(col("sample")).cast("long")).as("sample_valid"))
    },

    // Sketch family beyond HLL: approximate quantiles. The sketch
    // values are engine-private, so the hashed output audits them
    // against the EXACT rank they claim: count(x <= v) must sit
    // within the published rank-error bound (accuracy 1000 ⇒ ε =
    // 1/1000 of n; checked at 2ε + 2 slack). One extra corpus pass
    // joining a broadcast per-group sketch row — O(groups) shipped.
    // Exact counterpart remains q_percentile.
    QueryDef.sql(
      "q_approx_quantile",
      """SELECT l_returnflag,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       TRUE AS p50_in_bound,
        |       TRUE AS p99_in_bound
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val sketch = li.groupBy(col("l_returnflag"))
        .agg(
          approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("ap50"),
          approx_percentile(col("l_extendedprice"), lit(0.99), lit(1000))
            .as("ap99"))
      // the sketch's contract is about SOME rank of the returned
      // value v: v occupies ranks [count(<v)+1, count(<=v)], and the
      // guarantee holds iff that interval intersects [pn−εn, pn+εn].
      // Checking count(<=v) alone would false-alarm on a value with a
      // large point mass (many duplicates of v push count(<=v) past
      // the bound while the sketch is in spec).
      def inBound(lt: Column, le: Column, n: Column, p: Double): Column =
        (lt + 1 <= n * p + n * 0.002 + 2) && (le >= n * p - n * 0.002 - 2)
      li.join(broadcast(sketch), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(when(col("l_extendedprice") < col("ap50"), 1L).otherwise(0L))
            .as("lt50"),
          sum(when(col("l_extendedprice") <= col("ap50"), 1L).otherwise(0L))
            .as("le50"),
          sum(when(col("l_extendedprice") < col("ap99"), 1L).otherwise(0L))
            .as("lt99"),
          sum(when(col("l_extendedprice") <= col("ap99"), 1L).otherwise(0L))
            .as("le99"))
        .select(col("l_returnflag"), col("n_items"),
          inBound(col("lt50"), col("le50"), col("n_items"), 0.5)
            .as("p50_in_bound"),
          inBound(col("lt99"), col("le99"), col("n_items"), 0.99)
            .as("p99_in_bound"))
    },

    // CUBE grouping sets with grouping() flags (A6 family).
    QueryDef.sql(
      "q_cube",
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
        |       CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
        |       count(*) AS cnt
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            grouping(col("o_orderstatus")).cast("int").as("g_status"),
            grouping(col("o_orderpriority")).cast("int").as("g_prio"),
            count(lit(1)).as("cnt"))
          .select(col("o_orderstatus"), col("o_orderpriority"),
            col("g_status"), col("g_prio"), col("cnt"))
    },

    // ARBITRARY grouping sets (A6 family): the asymmetric set list
    // {(status, priority), (status), (priority)} — producible by
    // neither ROLLUP (which would add the grand total) nor CUBE
    // (which would add both extras) — through Spark 4's native
    // `Dataset.groupingSets`, with the standard grouping_id bit
    // vector (bit i set when grouping column i is aggregated away)
    // disambiguating the null-vs-aggregated cases on both engines.
    // One shuffle: grouping sets expand map-side (Expand operator),
    // partial-aggregate, then exchange once on the expanded keys.
    QueryDef.sql(
      "q_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping_id(o_orderstatus, o_orderpriority)
        |            AS INTEGER) AS gid,
        |       count(*) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), (o_orderpriority))""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "orders")
          .groupingSets(
            Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
              Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            grouping_id(col("o_orderstatus"), col("o_orderpriority"))
              .cast("int").as("gid"),
            count(lit(1)).as("cnt"))
          .select(col("o_orderstatus"), col("o_orderpriority"),
            col("gid"), col("cnt"))
    },

    // ANALYZE-style optimizer statistics (the ANALYZE TABLE ...
    // COMPUTE STATISTICS FOR COLUMNS shape): one stats row per column
    // — rows, non-nulls, exact NDV, min/max — the table a cost-based
    // optimizer's join-reorder and broadcast decisions read, and the
    // static companion of q_sketch_ams's live join-size feed. ONE
    // corpus pass: the multi-column exact countDistinct plans as a
    // single aggregate over an Expand (rows × columns — the standard
    // Spark shape); at 100 TB swap countDistinct for
    // approx_count_distinct and the Expand disappears into plain
    // partial aggregates. min/max stringify through decimal(12,2)
    // for the double column so both engines format identically.
    QueryDef.sql("q_table_stats", tableStatsSql) { (s, dir) =>
      // spread(): the Expand × exact-countDistinct partial agg runs
      // in the SCAN stage's tasks, and a one-file table pins that
      // CPU-heavy pass to one core (the r17 single-task-scan trap);
      // at real file counts this is a no-op
      tableStats(DedupOps.spread(Tables(s, dir, "orders")), StatsCols)
    },

    // Time-RANGE window frame: per event, the same user's activity in
    // the trailing hour — the rate/velocity feature every
    // event-pipeline feature store computes. RANGE (not ROWS) frames
    // include all ts peers, identically on both engines; the summed
    // measure is per-element integer cents so no float sum-order can
    // diverge between Spark's frame iteration and DuckDB's segment
    // tree. One user_id shuffle; frame state is bounded by an hour of
    // one user's events.
    QueryDef.sql(
      "q_window_trailing",
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |       CAST(count(*) OVER w AS BIGINT) AS n_trailing,
        |       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w
        |            AS BIGINT) AS cents_trailing,
        |       round(max(value) OVER w, 2) AS max_trailing
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
          .rangeBetween(-3600000000L, Window.currentRow)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts_us"),
            count(lit(1)).over(w).as("n_trailing"),
            sum(round(col("value") * 100, 0).cast("long")).over(w)
              .as("cents_trailing"),
            round(max(col("value")).over(w), 2).as("max_trailing"))
    }
  )

  /** The q_length_quartiles body, named so the gate registration and
    * the planted odd/even-group spec drive the SAME production
    * expressions (the q_mix_sources convention): discrete rank
    * ((n−1)·q) div 100 + 1 selection per source over (source, len)
    * pairs. */
  def lengthQuartiles(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val l = docs.select(col("source"),
      size(split(col("text"), " ")).cast("long").as("len"))
    val bySrc = Window.partitionBy(col("source"))
    val r = l
      .withColumn("rn", row_number().over(bySrc.orderBy(col("len"))))
      .withColumn("n", count(lit(1)).over(bySrc))
    def pick(q: Int) = min(when(
      col("rn") === expr(s"(n - 1) * $q div 100 + 1"), col("len")))
    r.groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        pick(25).as("p25_tokens"), pick(50).as("p50_tokens"),
        pick(75).as("p75_tokens"), max(col("len")).as("max_tokens"))
  }

  /** q_table_stats columns with a stringification tag — "dec" routes
    * min/max through decimal(12,2) so double formatting agrees
    * cross-engine. One list drives the Spark aggregates AND the
    * generated oracle, so a column retag cannot desynchronize them.
    * A `def`: `all` above reads it during object init (the oracle
    * `def` convention — a val here would still be null there). */
  private[operators] def StatsCols: Seq[(String, String)] = Seq(
    "o_orderkey" -> "raw", "o_custkey" -> "raw",
    "o_orderstatus" -> "raw", "o_totalprice" -> "dec",
    "o_orderpriority" -> "raw")

  private[operators] def statsVal(c: String, t: String) =
    if (t == "dec") col(c).cast("decimal(12,2)") else col(c)

  /** The per-column ANALYZE statistics of `df` — the q_table_stats
    * body, factored so the SAME computation both serves the gate and
    * feeds the session catalog ([[feedCatalogStats]]): one stats row
    * per column with rows / non-nulls / NDV / min / max.
    * `exact = false` swaps the exact multi-column countDistinct (an
    * Expand pass — rows × columns) for approx_count_distinct, which
    * collapses to plain map-side partial aggregates: the 100 TB
    * maintenance-path mode (optimizer statistics tolerate HLL error;
    * the gate keeps the exact mode so the oracle can replay it).
    * `withLengths = true` additionally folds avg/max byte-length
    * aggregates for var-width (string/binary) columns into the SAME
    * aggregate pass, surfacing them as nullable `avg_len`/`max_len`
    * stats-row fields — so [[feedCatalogStats]] can size those
    * columns without a second scan of the table (the gate keeps the
    * default so its oracle schema is untouched). */
  def tableStats(df: DataFrame, cols: Seq[(String, String)],
      exact: Boolean = true, withLengths: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, StringType}
    val varWidth: Set[String] =
      if (!withLengths) Set.empty
      else df.schema.collect {
        case f if f.dataType == StringType || f.dataType == BinaryType =>
          f.name
      }.toSet
    val lenOf = (c: String) =>
      if (df.schema(c).dataType == StringType) expr(s"octet_length(`$c`)")
      else length(col(c))
    val aggs = cols.flatMap { case (c, t) =>
      val v = statsVal(c, t)
      val ndv = if (exact) countDistinct(v) else approx_count_distinct(v)
      val base = Seq(count(v).as(s"nn_$c"), ndv.as(s"ndv_$c"),
        min(v).cast("string").as(s"min_$c"),
        max(v).cast("string").as(s"max_$c"))
      if (varWidth(c))
        base ++ Seq(
          ceil(avg(lenOf(c))).cast("long").as(s"avglen_$c"),
          max(lenOf(c)).cast("long").as(s"maxlen_$c"))
      else base
    }
    val a = df.agg(count(lit(1)).as("n"), aggs: _*)
    val lenFields = (c: String) =>
      if (!withLengths) Nil
      else if (varWidth(c))
        Seq(col(s"avglen_$c").as("avg_len"), col(s"maxlen_$c").as("max_len"))
      else
        Seq(lit(null).cast("long").as("avg_len"),
          lit(null).cast("long").as("max_len"))
    a.select(explode(array(cols.map { case (c, _) =>
      struct(Seq(lit(c).as("col_name"), col("n").as("n_rows"),
        col(s"nn_$c").as("n_notnull"), col(s"ndv_$c").as("ndv"),
        col(s"min_$c").as("min_val"), col(s"max_$c").as("max_val")) ++
        lenFields(c): _*)
    }: _*)).as("r")).select(col("r.*"))
  }

  /** Feed a [[tableStats]] frame INTO the session catalog as the
    * statistics of `tableName`, closing the ANALYZE loop: collected
    * stats become `CatalogStatistics` (row count, a row-width-derived
    * logical size, and per-column NDV / null-count / numeric min-max)
    * that Catalyst's size estimation and CBO actually READ — with
    * `spark.sql.cbo.enabled`, a join side whose ROW-based size fits
    * under `autoBroadcastJoinThreshold` flips to broadcast-hash even
    * when its on-disk footprint (the no-stats fallback estimate) says
    * otherwise. That correction matters exactly where streaming
    * ingest leaves a dimension fragmented across many small files:
    * per-file overhead inflates the disk sum far past the logical
    * size, and without fed stats the optimizer sort-merge-joins a
    * dimension that comfortably broadcasts (StatsFeedSpec pins the
    * flip both ways). The collect is one row per COLUMN —
    * dictionary-sized, never data-sized.
    *
    * min/max feed only for numeric columns (the catalog's external
    * string form round-trips through the column's own type; string
    * min/max are not part of Spark's column-stat contract). */
  def feedCatalogStats(
      spark: SparkSession, tableName: String, stats: DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
    val rows = stats.collect()
    require(rows.nonEmpty, s"empty stats frame for $tableName")
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    val nRows = rows.head.getLong(1)
    val schema = spark.table(tableName).schema
    // var-width columns get MEASURED average/max byte lengths: sizing
    // them by dataType.defaultSize (20 bytes for ANY string) would
    // underestimate a text-heavy dimension by orders of magnitude and
    // wrongly flip a multi-GB table to broadcast — the inverse of the
    // fragmented-files overestimate this feed exists to correct (spec
    // pins both directions). The measurements ride IN the stats frame
    // (`tableStats(withLengths = true)` folds them into the one
    // aggregate pass), so ANALYZE stays a single table scan plus a
    // dictionary-sized collect — no second scan here.
    val hasLens = stats.schema.fieldNames.contains("avg_len")
    val lenIdx = if (hasLens) stats.schema.fieldIndex("avg_len") else -1
    val measured: Map[String, (Long, Long)] =
      if (!hasLens) Map.empty
      else byCol.collect {
        case (c, r) if !r.isNullAt(lenIdx) =>
          c -> (r.getLong(lenIdx), r.getLong(lenIdx + 1))
      }
    val colStats = schema.flatMap { f =>
      byCol.get(f.name).map { r =>
        val numeric =
          f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
        f.name -> CatalogColumnStat(
          distinctCount = Some(BigInt(r.getLong(3))),
          min = if (numeric) Option(r.getString(4)) else None,
          max = if (numeric) Option(r.getString(5)) else None,
          nullCount = Some(BigInt(nRows - r.getLong(2))),
          avgLen = measured.get(f.name).map(_._1),
          maxLen = measured.get(f.name).map(_._2))
      }
    }.toMap
    val rowWidth = schema.map(f =>
      measured.get(f.name).map(_._1).getOrElse(
        f.dataType.defaultSize.toLong)).sum + 8
    spark.sessionState.catalog.alterTableStats(
      TableIdentifier(tableName),
      Some(CatalogStatistics(
        sizeInBytes = BigInt(nRows) * rowWidth,
        rowCount = Some(BigInt(nRows)),
        colStats = colStats)))
    // record the row count THIS full analyze measured, separately
    // from the (append-bumped) live rowCount: the growth baseline
    // [[maintainStatsOnAppend]] decides re-ANALYZE against
    val cat = spark.sessionState.catalog
    val meta = cat.getTableMetadata(TableIdentifier(tableName))
    cat.alterTable(meta.copy(properties =
      meta.properties + (AnalyzedRowsProp -> nRows.toString)))
    // drop the cached relation: already-resolved plans hold the OLD
    // (possibly absent) stats
    spark.catalog.refreshTable(tableName)
  }

  /** Row count recorded by the last FULL analyze, as a table
    * property — the denominator of the append-growth ratio. */
  private val AnalyzedRowsProp = "graft.stats.analyzedRows"

  /** Appended-rows fraction past which an append triggers a full
    * re-ANALYZE instead of a row-count bump: NDV/min-max drift
    * roughly with volume, so half-again growth is where the stale
    * column stats start misleading the optimizer more than a scan
    * costs to fix. */
  val StatsRefreshFraction = 0.5

  /** Snapshot the append target's catalog statistics BEFORE a write
    * wipes them (see [[maintainStatsOnAppend]]). None when the table
    * does not exist yet or was never analyzed. */
  def preAppendStats(spark: SparkSession, tableName: String)
      : Option[org.apache.spark.sql.catalyst.catalog.CatalogStatistics] =
    if (!spark.catalog.tableExists(tableName)) None
    else spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(
        graft.sources.Sources.physicalName(spark, tableName))).stats

  /** Keep catalog statistics CURRENT under appends — the maintenance
    * every long-running ingest needs between compactions (the append
    * paths otherwise serve increasingly stale estimates until
    * someone compacts). Called by [[appendBucketedWithStats]] —
    * under the table's writer lock — with the observed appended row
    * count:
    *
    *  - never-analyzed table → no-op (there is no estimate to keep
    *    fresh, and silently paying an ANALYZE scan per trigger on a
    *    table nobody asked to analyze is the wrong default);
    *  - analyzed table → bump rowCount and scale sizeInBytes by the
    *    OBSERVED increment (exact, zero scan — two catalog ops; the
    *    size scales LINEARLY from row counts, so a batch whose rows
    *    are much wider than the analyzed distribution under-sizes
    *    the estimate until the fractional re-ANALYZE below resets
    *    it — bounded drift, by construction ≤ StatsRefreshFraction
    *    of the table);
    *  - bumped count grown ≥ [[StatsRefreshFraction]] past the last
    *    full analyze → re-ANALYZE (approx-NDV maintenance mode),
    *    resetting the baseline, so per-column NDV/min-max never lag
    *    volume by more than the fraction.
    *
    * Resolution goes through the version pointer, so the stats land
    * on the physical table the reads actually plan against.
    *
    * `pre` is the snapshot [[preAppendStats]] took BEFORE the write:
    * Spark's insert path wipes a table's catalog statistics as stale
    * (`CommandUtils.updateTableStats` with size-auto-update off), so
    * by the time this runs the catalog says None — the pre-append
    * snapshot is the truth the bump extends. */
  def maintainStatsOnAppend(
      spark: SparkSession, tableName: String, appendedRows: Long,
      pre: Option[org.apache.spark.sql.catalyst.catalog.CatalogStatistics])
      : Unit = {
    import org.apache.spark.sql.catalyst.TableIdentifier
    import org.apache.spark.sql.catalyst.catalog.CatalogStatistics
    val phys = graft.sources.Sources.physicalName(spark, tableName)
    val cat = spark.sessionState.catalog
    val meta = cat.getTableMetadata(TableIdentifier(phys))
    pre.foreach { st =>
      val oldRows = st.rowCount.map(_.toLong).getOrElse(0L)
      val newRows = oldRows + appendedRows
      val recorded = meta.properties.get(AnalyzedRowsProp)
        .flatMap(_.toLongOption)
      val baseline = recorded.getOrElse(oldRows)
      // max(1, ...) keeps an analyzed-at-empty baseline from pinning
      // the bump path forever (0 + 0.5*0 would never trigger)
      val threshold =
        baseline + math.max(1L, (baseline * StatsRefreshFraction).toLong)
      if (appendedRows > 0 && newRows >= threshold) {
        analyzeTable(spark, tableName, exact = false)
      } else if (appendedRows > 0) {
        // a table ANALYZEd outside this module has no recorded
        // baseline: anchor it at the FIRST pre-append count or the
        // fallback re-derives from the already-bumped count every
        // trigger — a moving target that never reaches the threshold
        // for any ingest appending < the fraction per trigger, so the
        // documented bounded NDV/min-max drift would silently never
        // hold. Property write FIRST (the fetched meta's stats field
        // is stale; writing it after alterTableStats would clobber
        // the fresh numbers).
        if (recorded.isEmpty)
          cat.alterTable(meta.copy(properties =
            meta.properties + (AnalyzedRowsProp -> oldRows.toString)))
        val newSize =
          if (oldRows > 0)
            st.sizeInBytes * BigInt(newRows) / BigInt(oldRows)
          else st.sizeInBytes
        cat.alterTableStats(TableIdentifier(phys),
          Some(CatalogStatistics(
            sizeInBytes = newSize,
            rowCount = Some(BigInt(newRows)),
            colStats = st.colStats)))
        spark.catalog.refreshTable(phys)
      }
    }
  }

  /** The stats-maintaining append, whole: snapshot → append → bump,
    * under the TABLE's writer lock so the read-modify-write on the
    * catalog statistics is atomic against other in-driver mutators
    * (two appenders snapshotting the same baseline would lose an
    * increment; a compaction's fresh ANALYZE landing mid-triplet
    * would be clobbered by the stale snapshot). The one body behind
    * [[graft.operators.DedupOps.appendBands]] and
    * [[graft.operators.SimilarityOps.appendIvfIndex]]: the count is
    * observed on the write itself (no extra scan) and only when a
    * stats snapshot exists to extend (no-op — and no listener-bus
    * wait — on a never-analyzed table). */
  def appendBucketedWithStats(batch: DataFrame, tableName: String,
      bucketCols: Seq[String], numBuckets: Int): Long =
    graft.sources.Sources.withTableLock(batch.sparkSession, tableName) {
      val pre = preAppendStats(batch.sparkSession, tableName)
      val appended = graft.sources.Sources.appendBucketed(
        batch, tableName, bucketCols, numBuckets,
        observeCount = pre.isDefined)
      if (pre.isDefined)
        maintainStatsOnAppend(batch.sparkSession, tableName, appended, pre)
      appended
    }

  /** ANALYZE a catalog table end to end: [[tableStats]] over its
    * current rows, fed back via [[feedCatalogStats]] — the engine's
    * `ANALYZE TABLE t COMPUTE STATISTICS FOR ALL COLUMNS`.
    * `exact = false` is the maintenance-path mode (approx NDV, no
    * Expand) a compaction pass runs after rewriting a stored
    * artifact. */
  def analyzeTable(spark: SparkSession, tableName: String,
      exact: Boolean = true): Unit = {
    // versioned tables: stats belong on the PHYSICAL version the
    // pointer view serves (CBO reads them off the underlying
    // relation when the view inlines); plain tables resolve to
    // themselves
    val phys = graft.sources.Sources.physicalName(spark, tableName)
    val df = spark.table(phys)
    feedCatalogStats(spark, phys,
      tableStats(df, df.schema.map(_.name -> "raw"), exact,
        withLengths = true))
  }

  /** Generated oracle for q_table_stats: the same per-column stats as
    * a one-row aggregate fanned out by UNION ALL. */
  private def tableStatsSql: String = {
    val aggs = StatsCols.map { case (c, t) =>
      val v = if (t == "dec") s"CAST($c AS DECIMAL(12,2))" else c
      s"""CAST(count($v) AS BIGINT) AS nn_$c,
         |  CAST(count(DISTINCT $v) AS BIGINT) AS ndv_$c,
         |  CAST(min($v) AS VARCHAR) AS min_$c,
         |  CAST(max($v) AS VARCHAR) AS max_$c""".stripMargin
    }.mkString(",\n  ")
    val rows = StatsCols.map { case (c, _) =>
      s"""SELECT '$c' AS col_name, n AS n_rows, nn_$c AS n_notnull,
         |       ndv_$c AS ndv, min_$c AS min_val, max_$c AS max_val
         |FROM a""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |  $aggs
       |FROM orders)
       |$rows""".stripMargin
  }
}
