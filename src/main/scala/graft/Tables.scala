package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated TPC-H-ish parquet tables (see
  * TESTDATA.md): region nation customer supplier part orders lineitem
  * events documents embeddings.
  *
  * All query entry points take a scale-factor directory so the same
  * code runs at sf0.001 (smoke), sf0.01 (correctness), sf0.1 (bench)
  * — and, unchanged, against a cluster-scale path: nothing here
  * assumes local files beyond the path string.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view for `spark.sql` passthrough —
    * the analog of the reference's `pimdb query` entry point
    * (reference: command.py:223-237).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  /** `events` with a normalized `ts_us` epoch-microseconds column.
    *
    * The driver's parquet stores `ts` as TIMESTAMP(NANOS), which Spark 4
    * only reads as a nanos Long under
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in our sessions);
    * DuckDB reads it as TIMESTAMP_NS. Comparing/ordering on epoch micros
    * (`ts_us` here, `epoch_us(ts)` in oracle SQL) aligns both engines.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val e = apply(spark, dir, "events")
    val us = e.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.functions.expr("ts DIV 1000")
      case _ => org.apache.spark.sql.functions.unix_micros(
        org.apache.spark.sql.functions.col("ts"))
    }
    e.withColumn("ts_us", us)
  }
}
