package graft.imdb

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Deterministic dense surrogate-id assignment: ids 1..N in sorted
  * natural-key order (reference: pimdb/database.py:631-634, 730-732 —
  * autoincrement over sorted inserts).
  *
  * The naive `row_number() OVER (ORDER BY key)` is a single-task
  * global window — fine for dictionary tables, fatal at 100 TB entity
  * tables (SURVEY §7.4.3). This implements the two-phase pattern:
  * range-sort, count per partition, broadcast cumulative offsets,
  * then partition-local increments (`zipWithIndex`), so no task ever
  * sees more than one partition of data.
  *
  * Ids are derived from *sorted natural keys*, never physical row
  * order, so they are reproducible across runs and self-consistent
  * between tables built in different jobs (SURVEY §7.4.2).
  */
object SurrogateIds {

  def assign(df: DataFrame, idCol: String, sortCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(sortCols: _*)
    val newSchema = StructType(
      StructField(idCol, IntegerType, nullable = false) +: sorted.schema.fields)
    val rows = sorted.rdd
      .zipWithIndex() // internally: per-partition counts + offsets, one extra count job
      .map { case (r, i) => Row.fromSeq((i + 1).toInt +: r.toSeq) }
    spark.createDataFrame(rows, newSchema)
  }

  /** Same two-phase assignment with 64-bit ids — for corpus-scale
    * orderings (beyond 2^31 rows the int variant would wrap
    * negative). The int variant stays for the IMDb tables, whose
    * reference schema is integer autoincrement. */
  def assignLong(df: DataFrame, idCol: String, sortCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(sortCols: _*)
    val newSchema = StructType(
      StructField(idCol, LongType, nullable = false) +: sorted.schema.fields)
    val rows = sorted.rdd
      .zipWithIndex()
      .map { case (r, i) => Row.fromSeq((i + 1L) +: r.toSeq) }
    spark.createDataFrame(rows, newSchema)
  }
}
