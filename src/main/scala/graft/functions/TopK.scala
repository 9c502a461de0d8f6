package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k per key with BOUNDED partial aggregation.
  *
  * `row_number() OVER (PARTITION BY key ORDER BY ord)` + filter ≤ k
  * shuffles EVERY row of every group and sorts whole groups, then
  * discards all but k. This aggregator keeps at most k (ord, id)
  * pairs per key per map task, so the shuffle carries k rows per
  * (partition, key) and the merge is a k-way sorted merge — at 100 TB
  * the difference between shuffling the fact table and shuffling a
  * bounded digest. Same rows, same order, same ranks as the window
  * form (pinned in the spec).
  *
  * Ordering: ord DESC, id ASC tie-break — matching the
  * `orderBy(col(ord).desc, col(id))` window convention used across
  * this repo.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), TopKAggregator.Buf, Seq[(Double, Long)]] {

  import TopKAggregator._
  require(k > 0)

  // sorted best-first: (-ord, id) ascending
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Buf = Buf(Vector.empty)

  override def reduce(b: Buf, v: (Double, Long)): Buf = insert(b, v)

  override def merge(b1: Buf, b2: Buf): Buf =
    b2.items.foldLeft(b1)(insert)

  private def insert(b: Buf, v: (Double, Long)): Buf =
    if (b.items.length < k) Buf((b.items :+ v).sortWith(lt))
    else if (lt(v, b.items.last)) Buf((b.items.init :+ v).sortWith(lt))
    else b

  override def finish(b: Buf): Seq[(Double, Long)] = b.items

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {
  final case class Buf(items: Vector[(Double, Long)])
}

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
    val agg = udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    df.groupBy(keyCols.map(col): _*)
      .agg(agg(col(ordCol).cast("double"), col(idCol).cast("long")).as("top"))
      .select(keyCols.map(col) :+ posexplode(col("top")).as(Seq("pos", "entry")): _*)
      .select(keyCols.map(col) ++ Seq(
        col("entry._2").as(idCol),
        col("entry._1").as(ordCol),
        (col("pos") + 1).cast("int").as("rnk")): _*)
  }
}
