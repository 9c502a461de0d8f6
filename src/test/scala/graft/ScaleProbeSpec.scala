package graft

/** Pins the PLAN SHAPE of the ScaleProbe race's production bodies —
  * the structural 100 TB properties the SCALE.md r16 table measured
  * by hand. Wall-clock deltas between the exact and approximate
  * quality-prune paths are invisible at gate scale (both finish in
  * seconds at sf0.001), so timing can't guard the structure; the plan
  * can. If a refactor reintroduces a per-source rank window into the
  * approx path, or turns its broadcast threshold join into a shuffle,
  * this spec fails even though every correctness gate stays green.
  */
class ScaleProbeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.joins.{
    BroadcastHashJoinExec, SortMergeJoinExec}
  import org.apache.spark.sql.execution.window.WindowExec

  // AQE is disabled during plan builds so the physical tree is
  // directly inspectable (the PlanAuditSpec discipline) — under AQE
  // the executedPlan is one AdaptiveSparkPlanExec LEAF and a
  // collectWithSubqueries over it sees nothing, turning a "no
  // windows" assertion into a vacuous pass. The broadcast decision
  // survives AQE-off because qualityPruneApprox HINTS it explicitly.
  private def staticPlan(body: (org.apache.spark.sql.SparkSession,
      String) => org.apache.spark.sql.DataFrame): SparkPlan = {
    val k = "spark.sql.adaptive.enabled"
    val saved = spark.conf.getOption(k)
    spark.conf.set(k, "false")
    try body(spark, sfDir).queryExecution.executedPlan
    finally saved.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  test("the approx prune path has no per-source rank window and joins " +
    "its thresholds by broadcast, not shuffle") {
    val plan = staticPlan(ScaleProbe.probes("quality_prune_approx"))
    // the whole point of the approximate path: NO window anywhere —
    // phase 1 is a sketch aggregate, phase 2 a threshold filter. A
    // WindowExec here means someone reintroduced the per-source
    // funnel the path exists to avoid (one reducer per source at
    // 100 TB, where a single source can be most of the corpus).
    val windows = plan.collectWithSubqueries { case w: WindowExec => w }
    assert(windows.isEmpty,
      s"approx prune path grew ${windows.size} window(s) — the " +
        "per-source funnel is back")
    // the per-source thresholds are a |sources|-row frame: the join
    // against the corpus-sized margins must broadcast them, never
    // shuffle the margins to meet them
    assert(plan.collectWithSubqueries {
        case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"threshold join is not a broadcast hash join:\n$plan")
    assert(plan.collectWithSubqueries {
        case s: SortMergeJoinExec => s }.isEmpty,
      "approx prune path shuffles the corpus to meet a tiny " +
        s"threshold table:\n$plan")
  }

  test("the exact prune path DOES rank inside a per-source window — " +
    "the shape the approx path replaces (spec sanity: the two paths " +
    "are structurally distinguishable)") {
    val plan = staticPlan(ScaleProbe.probes("quality_prune_exact"))
    val windows = plan.collectWithSubqueries { case w: WindowExec => w }
    assert(windows.nonEmpty, "exact path lost its rank window — it " +
      "no longer contrasts with the approx path this spec audits")
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "exact path's window must partition by source, not run global")
  }

  test("the probe bodies still carry the columns the gates consume " +
    "(registry honesty: probe and gate can't silently drift apart)") {
    // value-level agreement between the two cuts is hashed every
    // round by the q_quality_prune_approx GATE (per-source rank-error
    // band, DuckDB-replayed); what the gate can NOT see is the
    // ScaleProbe registry handing the race a different function than
    // the one the gate wraps. The schema contract is the cheap tell.
    val approx = ScaleProbe.probes("quality_prune_approx")(spark, sfDir)
    assert(approx.columns.toSeq ==
      Seq("doc_id", "source", "margin_e6", "thr_e6", "kept_top_half"),
      s"approx probe schema drifted: ${approx.columns.mkString(",")}")
    val exact = ScaleProbe.probes("quality_prune_exact")(spark, sfDir)
    assert(exact.columns.toSeq ==
      Seq("doc_id", "source", "margin_e6", "rnk", "kept_top_half"),
      s"exact probe schema drifted: ${exact.columns.mkString(",")}")
  }
}
