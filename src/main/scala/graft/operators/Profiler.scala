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
    // a public API over arbitrary ingests: column names go into
    // generated SQL, so the measure aliases are POSITIONAL (no name
    // interpolation at all) and the output labels are escaped string
    // literals — a name with a dash/space/dot/quote profiles fine
    val aggs = columns.zipWithIndex.flatMap { case (c, i) =>
      // df(c), not col(c): resolves the LITERAL name, so a dotted
      // column isn't misparsed as struct-field navigation
      Seq(
        sum(when(df(c).isNull, 1).otherwise(0)).cast("long").as(s"__nulls_$i"),
        count_distinct(df(c)).as(s"__dist_$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = columns.zipWithIndex
      .map { case (c, i) =>
        s"'${c.replace("'", "''")}', `__nulls_$i`, `__dist_$i`"
      }.mkString(", ")
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
