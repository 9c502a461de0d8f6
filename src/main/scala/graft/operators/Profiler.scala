package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: one pass over a table producing, per
  * column, its null count and exact distinct cardinality — the
  * "should I dictionary-encode / can I join on this / how dirty is
  * it" first look a 100 TB ingest needs.
  *
  * Shape: a single aggregate computes 2×N scalar measures (null
  * counts map-side-combine; distincts expand internally), then the
  * wide row is unpivoted with `stack` — no per-column job, one
  * scan.
  */
object Profiler {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val aggs = columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"__nulls_$c"),
        count_distinct(col(c)).as(s"__dist_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = columns
      .map(c => s"'$c', __nulls_$c, __dist_$c").mkString(", ")
    wide.selectExpr(
      s"stack(${columns.size}, $stackExpr) AS (column_name, n_nulls, n_distinct)")
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "q_profile", {
        val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        cols.map(c =>
          s"""SELECT '$c' AS column_name,
             |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
             |FROM orders""".stripMargin).mkString("\nUNION ALL\n")
      }) {
      (s, dir) =>
        profile(Tables(s, dir, "orders"),
          Seq("o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"))
    }
  )
}
