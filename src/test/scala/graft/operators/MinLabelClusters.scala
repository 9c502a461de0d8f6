package graft.operators

import graft.operators.Materialize.PinOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TEST-ONLY iterative min-label propagation over the LSH candidate
  * graph — the independent cross-check implementation for
  * [[DedupOps.dupClustersStar]]'s star contraction (the production
  * algorithm). Propagation converges in O(component diameter) driver
  * rounds, which is why it is quarantined here: on a 100 TB corpus a
  * boilerplate chain can string thousands of near-dups into a long
  * path, and per-hop propagation would pay a driver round-trip per 2
  * hops where the contraction pays ~4 rounds total. As a spec oracle
  * it is ideal — a completely different algorithm that must land on
  * the identical min-label fixed point.
  */
object MinLabelClusters {

  /** Min-label propagation: every round each doc adopts the smallest
    * cluster id among itself and its neighbors. Docs with no
    * candidate edge keep themselves as cluster_id, so the output is
    * total over the corpus. Convergence via the label-sum invariant:
    * least() makes every per-row label monotonically non-increasing,
    * so the exact decimal(38,0) sum of labels strictly decreases iff
    * any label changed. */
  def dupClusters(docs: DataFrame): DataFrame = {
    val pairs = DedupOps.lshCandidatePairs(docs)
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .pinnedIter
    // iterate only over docs with at least one candidate edge — the
    // vast majority are singletons and rejoin after convergence
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .pinnedIter

    def propagate(ls: DataFrame): DataFrame = {
      val nbrMin = edges
        .join(ls.select(col("doc_id").as("nbr"),
          col("cluster_id").as("nbr_label")),
          col("dst") === col("nbr"))
        .groupBy(col("src")).agg(min(col("nbr_label")).as("nbr_min"))
      ls.join(nbrMin, ls("doc_id") === nbrMin("src"), "left_outer")
        .select(ls("doc_id"),
          least(col("cluster_id"),
            coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
    }

    def labelSumOf(ls: DataFrame): java.math.BigDecimal = ls
      .agg(coalesce(sum(col("cluster_id").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")))
      .collect()(0).getDecimal(0)
    var prevSum = labelSumOf(labels)
    var changed = true
    while (changed) {
      // two hops per convergence check: labels travel 2 edges per
      // round, halving the driver round-trips vs check-every-hop
      val stepped = propagate(propagate(labels)).pinnedIter
      val labelSum = labelSumOf(stepped)
      changed = labelSum.compareTo(prevSum) < 0
      prevSum = labelSum
      Materialize.unpin(labels) // stepped is already materialized
      labels = stepped
    }
    Materialize.unpin(edges)
    docs.select(col("doc_id"))
      .join(labels.select(col("doc_id").as("d2"), col("cluster_id")),
        col("doc_id") === col("d2"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }
}
