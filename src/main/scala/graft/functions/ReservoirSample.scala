package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (`Aggregator[IN, BUF, OUT]`): DETERMINISTIC BOTTOM-K
  * sample of up to k distinct string values per group — the
  * training-data "take a reproducible sample of each source/language/
  * bucket" primitive, running in one pass with O(k) state per group
  * and an order-independent merge between partial buffers.
  *
  * Each value draws a pseudo-random priority as a pure function of
  * (seed, value); the buffer keeps the k smallest priorities. Because
  * the priority depends only on the value, duplicate values share one
  * priority: the output is a hash-ordered sample of the DISTINCT
  * values (not a uniform multiset sample — occurrence counts don't
  * change selection odds). That trade is what makes the sample
  * reproducible across partitionings and merges; for gate usage over
  * unique keys the two notions coincide.
  */
class ReservoirSample(k: Int, seed: Long)
    extends Aggregator[String, ReservoirSample.Buf, Seq[String]] {

  import ReservoirSample._
  require(k > 0, "k must be positive")

  private def priority(v: String): Long = {
    // splitmix64 over (seed, value hash) — stable across JVMs
    var z = seed + v.hashCode.toLong * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def zero: Buf = Buf(Vector.empty)

  // a null value never ranks (SQL aggregates skip nulls; unguarded,
  // priority(null).hashCode would NPE the whole job on one null row
  // of a nullable input column)
  override def reduce(b: Buf, v: String): Buf =
    if (v == null) b else insert(b, (priority(v), v))

  override def merge(b1: Buf, b2: Buf): Buf =
    b2.items.foldLeft(b1)(insert)

  // items kept sorted ascending by (priority, value); bottom-k
  // invariant. The contains skip makes the buffer a SET: duplicate
  // input values share one priority, so without it a repeated value
  // would occupy several slots and crowd out genuinely distinct
  // values — breaking the documented "k DISTINCT values /
  // occurrence counts don't change selection" contract
  private def insert(b: Buf, pv: (Long, String)): Buf =
    if (b.items.contains(pv)) b
    else if (b.items.length < k) Buf((b.items :+ pv).sorted)
    else if (Ordering[(Long, String)].lt(pv, b.items.last))
      Buf((b.items.init :+ pv).sorted)
    else b

  override def finish(b: Buf): Seq[String] = b.items.map(_._2).sorted

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object ReservoirSample {
  final case class Buf(items: Vector[(Long, String)])

  def sample(col: String, k: Int, seed: Long = 42L): TypedColumn[String, Seq[String]] =
    new ReservoirSample(k, seed).toColumn
}
