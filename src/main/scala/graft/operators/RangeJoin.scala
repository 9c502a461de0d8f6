package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join without a nested loop: match points `p` to
  * ranges `[lo, hi]` by binning both sides on a fixed width and
  * equi-joining on the bin — Spark's planner would otherwise emit a
  * BroadcastNestedLoopJoin for a pure range predicate
  * (O(|L|·|R|)); this shuffles on the bin key instead.
  *
  * Each range explodes into ceil(span/width)+1 bins; a point falls in
  * exactly one bin, so no post-dedup is needed — the bin equi-join
  * plus the exact range filter reproduces the theta-join result
  * precisely (pinned in the spec). Choose `binWidth` near the median
  * range span: too small explodes ranges, too big crowds bins.
  */
object RangeJoin {

  /** @param ranges DataFrame with numeric `lo`/`hi` columns (plus payload)
    * @param points DataFrame with a numeric `point` column (plus payload)
    */
  def binned(
      ranges: DataFrame, lo: String, hi: String,
      points: DataFrame, point: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // withColumn REPLACES an existing column of the same name, and
    // the final drop would then destroy caller payload silently —
    // the SurrogateIds working-column discipline: fail loudly
    require(!ranges.columns.contains("_bin") &&
        !points.columns.contains("_bin"),
      "binned range join: inputs must not carry a `_bin` column " +
        "(it is this operator's working column)")
    val binned_r = ranges.withColumn("_bin",
      explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    val binned_p = points.withColumn("_bin",
      floor(col(point) / binWidth).cast("long"))
    binned_r.join(binned_p, "_bin")
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("_bin")
  }
}
