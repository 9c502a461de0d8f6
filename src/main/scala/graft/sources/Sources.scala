package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** Format-agnostic table IO: the engine's source/sink surface.
  *
  * The reference's sinks are batched SQL INSERTs and TSV (SURVEY §2.1
  * S5-S8); here every Spark batch format plus JDBC is first-class, so
  * "maintain a local SQL copy" (the reference's whole purpose) works
  * against any JDBC database — writes are partition-parallel with
  * the reference's default batch size.
  */
object Sources {

  /** reference: pimdb/bulk.py:13 — default rows per INSERT batch. */
  val DefaultJdbcBatchSize = 1024

  /** Spark's built-in Derby dialect maps StringType to CLOB, which
    * Derby refuses to compare against literals (so the SQL copy is
    * unusable for WHERE clauses) and which breaks setNull on VARCHAR
    * columns. This dialect maps strings to comparable VARCHARs —
    * the analog of the reference's String/Text column split
    * (database.py:36-37). Registered lazily, takes precedence over
    * the builtin. */
  private object DerbyVarcharDialect extends JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:derby")
    override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
      case StringType => Option(JdbcType("VARCHAR(4000)", java.sql.Types.VARCHAR))
      case BooleanType => Option(JdbcType("BOOLEAN", java.sql.Types.BOOLEAN))
      case ShortType | ByteType =>
        Option(JdbcType("SMALLINT", java.sql.Types.SMALLINT))
      case _ => None
    }
  }
  private lazy val derbyDialectRegistered: Unit =
    JdbcDialects.registerDialect(DerbyVarcharDialect)

  private def ensureDialect(url: String): Unit =
    if (url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:derby"))
      derbyDialectRegistered

  def read(
      spark: SparkSession, format: String, path: String,
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format(format).options(options)
    schema.foreach(r.schema)
    r.load(path)
  }

  def write(
      df: DataFrame, format: String, path: String,
      options: Map[String, String] = Map.empty): Unit =
    df.write.format(format).options(options).mode(SaveMode.Overwrite).save(path)

  /** SQL-database sink (reference: BulkInsert, pimdb/bulk.py:22-72 —
    * but executed per-partition in parallel instead of one driver
    * loop). */
  def writeJdbc(
      df: DataFrame, url: String, table: String,
      batchSize: Int = DefaultJdbcBatchSize,
      options: Map[String, String] = Map.empty): Unit = {
    ensureDialect(url)
    df.write.options(options)
      .option("batchsize", batchSize.toString)
      .mode(SaveMode.Overwrite)
      .jdbc(url, table, new java.util.Properties())
  }

  def readJdbc(spark: SparkSession, url: String, table: String): DataFrame = {
    ensureDialect(url)
    spark.read.jdbc(url, table, new java.util.Properties())
  }

  /** Make a managed-table (re)write idempotent ACROSS JVMs: drop the
    * catalog entry if present, then remove a stale on-disk location a
    * PREVIOUS session may have left behind. With an ephemeral
    * session catalog (fresh driver, same warehouse dir — every
    * re-run of an index-build job), `SaveMode.Overwrite` alone fails
    * with LOCATION_ALREADY_EXISTS because the catalog has forgotten
    * the table while its files persist. A durable metastore makes the
    * DROP sufficient; the location sweep covers the catalog-lost
    * case. */
  def dropManaged(spark: SparkSession, tableName: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val path = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(tableName)))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  /** Bucketed + sorted managed table: equi-joins and aggregations on
    * `bucketCols` against another table bucketed the same way run
    * WITHOUT a shuffle — the on-disk layout replaces the exchange.
    * This is the 100 TB answer to "co-locate the big joins"
    * (SURVEY §4: indexes → partitioning decisions). */
  def writeBucketed(
      df: DataFrame, tableName: String,
      bucketCols: Seq[String], numBuckets: Int): Unit = {
    dropManaged(df.sparkSession, tableName)
    df.write
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** REPLACE `tableName` with `df`'s rows in the bucketed layout —
    * the read-modify-swap a per-trigger state table needs: `df` may
    * be DERIVED FROM the current `tableName` contents (the shadow
    * version is fully materialized before the old table is dropped,
    * so the lineage reads the old files intact), and a reader sees
    * the old fixed point, the new one, or — in the window between
    * the two catalog RENAMES — a clean TABLE-NOT-FOUND, never a
    * half-written table. The swap is rename-away → rename-in →
    * drop-after: the old version's (possibly large) file deletion
    * happens AFTER the new table is live, so the not-found window is
    * two O(1) catalog renames, not a recursive delete. A failed
    * rename propagates (failing the caller's trigger); the catalog
    * is never left pointing at partial data, and leftover `__next` /
    * `__old` tables from a crashed swap are reclaimed by the next
    * swap. Callers maintaining must-not-reset state should treat
    * "table absent after the first swap" as an error, not an empty
    * restart (the dedup-clusters gate does).
    * The repartition aligns rows to the writer's bucket hash
    * (pmod(murmur3(bucketCols), n) — same as `repartition`'s), so
    * the write runs as `numBuckets` PARALLEL tasks each producing
    * its bucket's one sorted file: state persistence scales with the
    * cluster instead of funnelling through a single task, and the
    * next trigger's read is a bucketed scan (per-key joins on
    * `bucketCols` need no exchange on the state side). This is the
    * state-maintenance twin of [[compactBucketed]] (same staging +
    * catalog-rename swap), distinguished by rewriting CONTENT rather
    * than layout. */
  def swapBucketed(df: DataFrame, tableName: String,
      bucketCols: Seq[String], numBuckets: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val shadow = tableName + "__next"
    val old = tableName + "__old"
    writeBucketed(df.repartition(numBuckets, bucketCols.map(col): _*),
      shadow, bucketCols, numBuckets)
    dropManaged(spark, old) // reclaim a crashed prior swap's leftover
    val had = spark.catalog.tableExists(tableName)
    if (had) spark.sql(s"ALTER TABLE `$tableName` RENAME TO `$old`")
    // catalog forgot the table but a DEAD session's files may still
    // sit at its location (the ephemeral-catalog re-run case
    // dropManaged exists for) — sweep them or the rename-in lands on
    // a non-empty directory
    else dropManaged(spark, tableName)
    spark.sql(s"ALTER TABLE `$shadow` RENAME TO `$tableName`")
    if (had) dropManaged(spark, old)
  }

  /** Compact a bucketed managed table back to ONE sorted file per
    * bucket. Every foreachBatch append (`appendIvfIndex`,
    * `appendBandIndex`) lands up to one new file per bucket per
    * trigger; bucket pruning and exchange-freedom survive that, but
    * Spark only trusts the per-bucket SORT when a bucket holds a
    * single file, so a long-running ingest gradually forfeits the
    * sort half of the layout (and pays many small reads).
    *
    * The writer's bucket id is pmod(murmur3(bucketCols), n) — the
    * same hash `repartition(n, bucketCols)` uses — so repartitioning
    * by the bucket columns puts each bucket's rows in exactly one
    * task, which then writes exactly one sorted file. The input is
    * read as PLAIN parquet over the table's current files, not via
    * `spark.table`: the table scan ADVERTISES the bucket layout, so
    * the optimizer elides a repartition over it as redundant — while
    * auto-bucketed-scan (no operator needs the distribution here)
    * actually reads plain size-packed splits that MIX buckets; the
    * elided shuffle then never re-aligns them and every task writes a
    * file per bucket it happens to hold, tasks × buckets small files.
    * The plain read carries no partitioning claim, so the aligning
    * shuffle survives.
    *
    * The rewrite stages through a shadow table swapped in by catalog
    * rename: a reader sees the old layout or the new, never a
    * half-written table. The maintenance companion every appended
    * stored artifact needs at 100 TB; run it off the serving path. */
  def compactBucketed(spark: SparkSession, tableName: String,
      bucketCols: Seq[String], numBuckets: Int): Unit = {
    import org.apache.spark.sql.functions.col
    val table = spark.table(tableName)
    val shadow = tableName + "__compact"
    val old = tableName + "__old"
    writeBucketed(
      spark.read.schema(table.schema).parquet(table.inputFiles: _*)
        .repartition(numBuckets, bucketCols.map(col): _*),
      shadow, bucketCols, numBuckets)
    // same rename-away -> rename-in -> drop-after sequence as
    // swapBucketed: the fragmented old files are deleted AFTER the
    // compacted table is live, so the not-found window is two O(1)
    // catalog renames rather than a recursive delete
    dropManaged(spark, old)
    spark.sql(s"ALTER TABLE `$tableName` RENAME TO `$old`")
    spark.sql(s"ALTER TABLE `$shadow` RENAME TO `$tableName`")
    dropManaged(spark, old)
  }
}
