package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-level min/max MANIFEST for a stored parquet dataset — the
  * table-format data-skipping primitive (what Iceberg/Delta keep in
  * their metadata layer) for plain parquet dirs: one manifest row
  * per file with per-column min/max, built in ONE scan and consulted
  * at query time to prune the FILE LIST before a scan is planned.
  *
  * Parquet footers already give ROW-GROUP pruning inside each file
  * Spark decides to open; the manifest removes whole files from the
  * listing, which is the lever that matters at 100 TB where opening
  * a footer per file is itself a metadata storm. Composes with the
  * [[graft.operators.ZOrder]] writers: a space-filling-curve layout
  * is precisely what makes per-file bounding boxes tight enough for
  * box queries to drop most files (measured in ZOrderSpec).
  *
  * Scale story for the manifest ITSELF: at O(10⁷) files the manifest
  * is a real (if small) table, so [[store]] writes it as parquet
  * SORTED on the leading tracked column's min — the metadata-level
  * z-order — and [[prunedRead]]'s keep predicate is built from
  * pushdown-translatable conjuncts (plain comparisons OR'd with
  * IS NULL, never coalesce/CASE), so consulting the manifest prunes
  * the MANIFEST's own row groups before a single row reaches the
  * driver. The final hand-off to Spark's reader is then bounded by
  * the files that MATCH the box (the data a table-format planner
  * must enumerate anyway), not by the table's total file count.
  */
object Manifest {

  /** Build the manifest over `df`'s files: (file, n_rows,
    * min_c/max_c per requested column). One scan, map-side combined
    * down to |files| rows — the groupBy key is the file each row
    * came from, so the exchange carries one partial per (task,
    * file). Rebuild after layout maintenance (compaction, re-sort);
    * an append-only ingest can instead append the new files' rows. */
  def build(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Persist a manifest, sorted on the leading tracked column's min:
    * the stored manifest's own parquet footers then carry tight
    * min/max on the stat columns, so a box consult scans only the
    * manifest row groups that can match — data skipping applied to
    * the skipping metadata itself. `leadCol` is the column queries
    * filter most selectively (the z-order leading dimension). */
  def store(manifest: DataFrame, dir: String, leadCol: String): Unit =
    manifest.sortWithinPartitions(col(s"min_$leadCol"))
      .write.mode("overwrite").parquet(dir)

  /** Incrementally extend a stored manifest with an appended batch's
    * files — the maintenance path an append-only ingest runs instead
    * of rebuilding over the whole table: O(batch), not O(table).
    * `newFiles` must cover ONLY the appended files (the appender has
    * exactly that DataFrame in hand — its foreachBatch argument).
    * The new rows land as their own manifest file(s), sorted on the
    * leading stat so their footers stay tight; pruning stays correct
    * between compactions, merely less globally ordered — a periodic
    * rebuild + [[store]] (run with the table's own compaction)
    * restores the single sorted layout. Safe under at-least-once
    * re-delivery: a re-appended batch duplicates manifest ROWS, and
    * [[prunedRead]] dedups the file list before reading. */
  def appendFiles(newFiles: DataFrame, cols: Seq[String], dir: String,
      leadCol: String): Unit =
    build(newFiles, cols).sortWithinPartitions(col(s"min_$leadCol"))
      .write.mode("append").parquet(dir)

  /** The file-keep predicate for a query box — kept
    * pushdown-translatable on purpose: each conjunct is
    * `(max_c >= lo OR max_c IS NULL) AND (min_c <= hi OR min_c IS
    * NULL)`, which Spark's DataSourceStrategy converts to parquet
    * row-group filters verbatim (a coalesce/CASE guard would be
    * semantically identical but unpushable, silently degrading the
    * manifest consult to a full metadata scan). NULL stats (a file
    * whose queried column is entirely NULL) read as 'unknown', so
    * conservative pruning keeps the file. */
  def keepExpr(ranges: Map[String, (Long, Long)]): Column =
    ranges.map { case (c, (lo, hi)) =>
      (col(s"max_$c") >= lo || col(s"max_$c").isNull) &&
        (col(s"min_$c") <= hi || col(s"min_$c").isNull)
    }.reduceOption(_ && _).getOrElse(lit(true))
    // no constrained columns = no pruning possible: keep every file
    // (the conservative default), not an empty-reduce crash

  /** Read ONLY the files whose per-column [min, max] envelope
    * INTERSECTS the query box (`ranges`: column -> inclusive
    * [lo, hi]). Pruning is conservative — a file is dropped only
    * when some queried column's range is provably disjoint — so the
    * pruned scan plus the original predicate returns exactly the
    * unpruned result (the gate hash-checks this against a plain
    * full-table oracle). The collected file list is bounded by the
    * files MATCHING the box ([[keepExpr]] prunes the manifest scan
    * itself before the collect) — the table-format metadata read,
    * bounded driver material by design. Callers still apply the
    * row-level predicate: the manifest prunes files, not rows. */
  def prunedRead(spark: SparkSession, schema: StructType,
      manifest: DataFrame, ranges: Map[String, (Long, Long)]): DataFrame = {
    // distinct: an at-least-once ingest that re-delivered a batch to
    // [[appendFiles]] holds the same file twice in the manifest —
    // its stats rows are identical, but reading the PATH twice would
    // duplicate every row it contains
    val files = manifest.filter(keepExpr(ranges))
      .select(col("file")).distinct().collect().map(_.getString(0))
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files.toIndexedSeq: _*)
  }
}
