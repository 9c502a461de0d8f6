package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.Generate
import org.apache.spark.sql.functions._

/** The membership-join rewrite must change the PLAN (nested-loop →
  * explode + equi-join) without changing the RESULT.
  *
  * The shared test session is built with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (see SparkSpec)
  * — the same wiring a cluster deploy uses — so the rule is active by
  * default here; the "without" baseline excludes it via
  * `spark.sql.optimizer.excludedRules`.
  */
class RewriteMembershipJoinSpec extends SparkSpec {

  import spark.implicits._

  private val ExcludeConf = "spark.sql.optimizer.excludedRules"

  private lazy val crew =
    Seq(("t1", "nm1,nm2"), ("t2", "nm2,nm3,nm2"), ("t3", "nm9"))
      .toDF("tconst", "directors")
  private lazy val names =
    Seq(("nm2", "Alice"), ("nm3", "Bob"), ("nm4", "Eve"))
      .toDF("nconst", "name")

  private def membershipJoin =
    crew.join(names,
      array_contains(split($"directors", ","), $"nconst"))

  test("without the rule: BroadcastNestedLoopJoin; with it: equi-join via Generate") {
    spark.conf.set(ExcludeConf, "graft.plans.RewriteMembershipJoin")
    try {
      val before = membershipJoin.queryExecution.executedPlan.toString
      assert(before.contains("BroadcastNestedLoopJoin"), before)
    } finally spark.conf.unset(ExcludeConf)

    val after = membershipJoin
    val optimized = after.queryExecution.optimizedPlan
    assert(optimized.collect { case g: Generate => g }.nonEmpty,
      optimized.toString)
    val phys = after.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin"), phys)

    // identical results, including the duplicate-element row (t2 has
    // nm2 twice but must match Alice exactly once)
    val rows = after.select($"tconst", $"nconst").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("t1", "nm2"), ("t2", "nm2"), ("t2", "nm3")))
    assert(after.count() == 3)
  }

  test("rule leaves equi-joins and filters untouched") {
    val equi = crew.join(names.withColumnRenamed("nconst", "tconst"), "tconst")
    assert(equi.queryExecution.optimizedPlan
      .collect { case g: Generate => g }.isEmpty)
    // array_contains as a plain FILTER (not a join condition) survives
    val filtered = crew.filter(array_contains(split($"directors", ","), "nm2"))
    assert(filtered.count() == 2)
  }
}
