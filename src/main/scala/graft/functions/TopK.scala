package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top-k per key with BOUNDED partial aggregation.
  *
  * `row_number() OVER (PARTITION BY key ORDER BY ord)` + filter ≤ k
  * shuffles EVERY row of every group and sorts whole groups, then
  * discards all but k. [[TopKAgg]] keeps at most k (ord, id) pairs
  * per key per map task, so the shuffle carries k rows per
  * (partition, key) and the merge is a k-way sorted merge — at 100 TB
  * the difference between shuffling the fact table and shuffling a
  * bounded digest. Same rows, same order, same ranks as the window
  * form (pinned in the spec).
  *
  * Ordering: ord DESC, id ASC tie-break — matching the
  * `orderBy(col(ord).desc, col(id))` window convention used across
  * this repo.
  */
object TopK {
  /** Top-k `idCol` rows per `keyCol`, ranked by `ordCol` DESC with
    * `idCol` ASC tie-break. Output: (keyCol, idCol, ordCol, rnk). */
  def perKey(df: DataFrame, keyCol: String, ordCol: String, idCol: String,
      k: Int): DataFrame =
    perKey(df, Seq(keyCol), ordCol, idCol, k)

  /** Multi-column-key variant — for callers whose key carries a
    * functionally-dependent rider (e.g. a vector's cell id rides its
    * vec_id): grouping by both keeps the rider in the output without
    * a join back to re-derive it, and the aggregation state is
    * unchanged (one k-bounded buffer per distinct key tuple).
    * Output: (keyCols…, idCol, ordCol, rnk). */
  def perKey(df: DataFrame, keyCols: Seq[String], ordCol: String,
      idCol: String, k: Int): DataFrame = {
    require(keyCols.nonEmpty, "TopK.perKey: at least one key column")
    // validate the column types BEFORE the casts: in a non-ANSI
    // session cast("long") of a non-numeric id yields null for every
    // row and the aggregate silently skips them all — an empty result
    // with no diagnostic where the window form would have ranked the
    // rows (the repo's own sessions run ANSI and would throw instead)
    import org.apache.spark.sql.types._
    val idType = df.schema(idCol).dataType
    require(idType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }, s"TopK.perKey: id column `$idCol` must be integral, got " +
      s"${idType.simpleString}")
    val ordType = df.schema(ordCol).dataType
    require(ordType.isInstanceOf[NumericType],
      s"TopK.perKey: ord column `$ordCol` must be numeric, got " +
        s"${ordType.simpleString}")
    // native TypedImperativeAggregate, not a udaf()-wrapped
    // Aggregator: the ScalaAggregator bridge deserialized every input
    // row into a boxed tuple and re-sorted an immutable Vector per
    // accepted insert — measured 1.7x slower than the window form it
    // was meant to beat on the q_knn_graph pair volume. The native
    // buffer reads the InternalRow directly into primitive arrays;
    // same comparator, same rows, same ranks (spec-pinned).
    val top = TopKAgg(df.sparkSession, col(ordCol).cast("double"),
      col(idCol).cast("long"), k)
    df.groupBy(keyCols.map(col): _*)
      .agg(top.as("top"))
      .select(keyCols.map(col) :+ posexplode(col("top")).as(Seq("pos", "entry")): _*)
      .select(keyCols.map(col) ++ Seq(
        col("entry._2").as(idCol),
        col("entry._1").as(ordCol),
        (col("pos") + 1).cast("int").as("rnk")): _*)
  }
}
