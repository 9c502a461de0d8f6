package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._

/** The screen rule is injected via spark.sql.extensions in the shared
  * test session, so `optimizedPlan` here reflects the cluster deploy.
  */
class PushLevenshteinScreenSpec extends SparkSpec {

  import spark.implicits._

  // file-backed, not a LocalRelation: the optimizer constant-folds a
  // filter over local rows into a pre-evaluated relation and the plan
  // under test would vanish
  private lazy val pairs = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lev_pairs").toString
    Seq(
      ("kitten", "sitting"),   // distance 3
      ("abc", "abd"),          // distance 1
      ("abc", "abc"),          // distance 0
      ("a", "abcdefgh"),       // length gap 7 — screen disqualifies at k=3
      (null.asInstanceOf[String], "x"), // null left
      ("x", null.asInstanceOf[String])) // null right
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("levenshtein(a,b) <= k rewrites to length screen + banded DP " +
    "in the optimized plan") {
    val df = pairs.filter("levenshtein(a, b) <= 3")
    val optimized = df.queryExecution.optimizedPlan
    val levs = optimized.expressions.flatMap(_.collect {
      case l: Levenshtein => l
    })
    assert(levs.nonEmpty, "Levenshtein vanished from the plan")
    assert(levs.forall(_.threshold.isDefined),
      s"unbounded Levenshtein survived the rewrite:\n$optimized")
    assert(optimized.toString.contains("length"),
      s"length screen missing from the rewritten predicate:\n$optimized")
  }

  test("rewritten predicates keep exact result semantics on boundary, " +
    "length-gap and null rows, for <=, <, and flipped forms") {
    // expected via driver-side reference distance (classic DP)
    def lev(x: String, y: String): Int = {
      val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    val rows = pairs.collect().map(r => (r.getString(0), r.getString(1)))
    def expect(pred: Int => Boolean): Set[(String, String)] =
      rows.filter { case (a, b) =>
        a != null && b != null && pred(lev(a, b))
      }.toSet
    def got(sql: String): Set[(String, String)] =
      pairs.filter(sql).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got("levenshtein(a, b) <= 3") == expect(_ <= 3))
    assert(got("levenshtein(a, b) <= 2") == expect(_ <= 2))
    assert(got("levenshtein(a, b) < 3") == expect(_ < 3))
    assert(got("3 >= levenshtein(a, b)") == expect(_ <= 3))
    assert(got("3 > levenshtein(a, b)") == expect(_ < 3))
    // the screen actually fires: the length-gap row is excluded even
    // though it never reaches the DP
    assert(!got("levenshtein(a, b) <= 3").contains(("a", "abcdefgh")))
  }

  test("a NULL threshold stays NULL through the rewrite: a coalesce " +
    "over the comparison must not flip rows") {
    // Spark's thresholded Levenshtein unboxes a null cap to 0 and
    // returns non-null -1; without the IsNull guard the rewritten
    // And read FALSE where the original was NULL, and
    // coalesce(FALSE, true) wrongly DROPPED the null-k row the
    // original coalesce(NULL, true) keeps. File-backed (the fixture
    // note above) and coalesce-shaped — a bare NOT normalizes to the
    // un-rewritable strict complement before the rule runs.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lev_nullk").toString
    Seq(("ab", "cd", null.asInstanceOf[Integer]),
      ("ab", "ab", Integer.valueOf(1)),
      ("ab", "xy", Integer.valueOf(0)))
      .toDF("a", "b", "k").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val q = df.filter("coalesce(levenshtein(a, b) <= k, true)")
    // original semantics: null k → TRUE (kept); 0 <= 1 kept;
    // 2 <= 0 dropped
    val got = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("ab", "cd"), ("ab", "ab")),
      s"null-threshold rows flipped: $got")
    // and the rewrite really fired (banded DP in the plan)
    val levs = q.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case l: Levenshtein => l })
    assert(levs.nonEmpty && levs.forall(_.threshold.isDefined))
  }

  test("strict bound at Int.MinValue cannot wrap: foldable k skips " +
    "the rewrite, non-foldable k short-circuits to empty") {
    // foldable degenerate bound: lev < Int.MinValue is always
    // false/null; an unguarded k-1 would wrap to Int.MaxValue and
    // keep EVERY row
    val degenerate = pairs.filter(s"levenshtein(a, b) < ${Int.MinValue}")
    assert(degenerate.count() == 0,
      "lev < Int.MinValue must keep no rows")
    val optimized = degenerate.queryExecution.optimizedPlan
    assert(!optimized.toString.contains(Int.MaxValue.toString),
      s"k-1 wrapped to Int.MaxValue in the plan:\n$optimized")
    // non-foldable k: a column bound hits the guarded path — rows
    // whose k IS Int.MinValue drop, normal bounds still screen
    val dirPath = java.nio.file.Files.createTempDirectory("graft_lev_kcol")
    graft.streaming.EventStreams.deleteRecursivelyOnExit(dirPath)
    val dir = dirPath.toString
    Seq(("kitten", "sitting", Int.MinValue), ("kitten", "sitting", 4),
      ("abc", "abd", Int.MinValue), ("abc", "abd", 2))
      .toDF("a", "b", "k").write.mode("overwrite").parquet(dir)
    val got = spark.read.parquet(dir)
      .filter("levenshtein(a, b) < k")
      .collect().map(r => (r.getString(0), r.getInt(2))).toSet
    assert(got == Set(("kitten", 4), ("abc", 2)),
      s"guarded column-bound rewrite returned $got")
  }

  test("already-thresholded levenshtein is left alone") {
    val df = pairs.filter("levenshtein(a, b, 5) <= 3")
    val optimized = df.queryExecution.optimizedPlan
    val levs = optimized.expressions.flatMap(_.collect {
      case l: Levenshtein => l
    })
    // exactly the user's banded call — no screen injected, no
    // double-banding
    assert(levs.nonEmpty && !optimized.toString.contains("abs(("),
      s"rule touched an already-thresholded call:\n$optimized")
  }
}
