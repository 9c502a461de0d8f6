package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF: MERGEABLE Misra–Gries heavy-hitter summary (Misra &
  * Gries, Sci.Comp.Prog.'82; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS'12 §3) — at most `k` (item, counter)
  * pairs per group plus the exact processed-item total `n`.
  *
  * Guarantees, held by construction through ANY partitioning and any
  * merge tree (these are what the gate audits):
  *   - every item with true count > n/(k+1) is present in the summary;
  *   - for every retained item, est ≤ true ≤ est + n/(k+1).
  *
  * The summary CONTENT (which sub-threshold items survive, and the
  * residual counter values) is partition-order-dependent, so gates
  * must emit only order-independent consequences of the guarantees —
  * membership of the exact heavy hitters and the error-bound flags —
  * never raw estimates. Same discipline as the HLL gate auditing its
  * 5% contract instead of hashing register values.
  *
  * Scale: k pairs of state per group whatever the item cardinality —
  * the top-table path that replaces a full (group, item) shuffle of
  * an unbounded key space with a k-bounded digest, partial-aggregated
  * map-side and merged associatively (so it is also a valid streaming
  * aggregation state, the frequent-items cousin of q_stream_hll's
  * register set).
  */
class FrequentItemsAggregator(k: Int)
    extends Aggregator[Seq[String], FrequentItems.Buf, FrequentItems.Buf] {
  require(k > 0)

  override def zero: FrequentItems.Buf = FrequentItems.Buf(0L, Map.empty)

  override def reduce(b: FrequentItems.Buf,
      items: Seq[String]): FrequentItems.Buf = {
    val m = mutable.HashMap.from(b.items)
    var n = b.n
    items.foreach { t =>
      n += 1
      m.get(t) match {
        case Some(c)            => m.update(t, c + 1)
        case None if m.size < k => m.update(t, 1L)
        case None =>
          // decrement-all: each such event removes k+1 units of count
          // mass (k counters + the unadmitted item), so at most
          // n/(k+1) events can ever subtract from any single item —
          // the undercount bound
          m.mapValuesInPlace((_, c) => c - 1)
          m.filterInPlace((_, c) => c > 0)
      }
    }
    FrequentItems.Buf(n, m.toMap)
  }

  override def merge(b1: FrequentItems.Buf,
      b2: FrequentItems.Buf): FrequentItems.Buf = {
    val sum = mutable.HashMap.from(b1.items)
    b2.items.foreach { case (t, c) => sum.update(t, sum.getOrElse(t, 0L) + c) }
    if (sum.size > k) {
      // subtract the (k+1)-th largest counter from every counter and
      // drop the non-positive — the Mergeable Summaries rule; at most
      // k items can exceed the threshold, and the combined undercount
      // stays within (n1+n2)/(k+1)
      val thr = sum.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      sum.mapValuesInPlace((_, c) => c - thr)
      sum.filterInPlace((_, c) => c > 0)
    }
    FrequentItems.Buf(b1.n + b2.n, sum.toMap)
  }

  override def finish(b: FrequentItems.Buf): FrequentItems.Buf = b

  override def bufferEncoder: Encoder[FrequentItems.Buf] =
    Encoders.product[FrequentItems.Buf]
  override def outputEncoder: Encoder[FrequentItems.Buf] =
    Encoders.product[FrequentItems.Buf]
}

object FrequentItems {
  /** `n` = exact total of items processed (order-independent);
    * `items` = the ≤k-entry counter summary (order-dependent — audit
    * its guarantees, don't hash it). */
  final case class Buf(n: Long, items: Map[String, Long])

  /** Column form over a per-row item-array column: one struct(n,
    * items) per group. */
  def sketch(items: Column, k: Int): Column =
    udaf(new FrequentItemsAggregator(k), ExpressionEncoder[Seq[String]]())(
      items)
}
