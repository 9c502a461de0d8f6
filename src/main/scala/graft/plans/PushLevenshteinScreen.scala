package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite unbounded thresholded edit-distance
  * predicates into their banded + pre-screened form,
  *
  * {{{ levenshtein(a, b) <= k }}}
  *
  * becoming
  *
  * {{{ abs(length(a) - length(b)) <= k AND levenshtein(a, b, k) >= 0 }}}
  *
  * Two independent wins, both semantics-preserving:
  *
  *  1. the LENGTH SCREEN: distance >= |len(a) - len(b)| always, so a
  *     length gap above k disqualifies the pair for the cost of two
  *     `length()` calls — the conjunct sits FIRST in the And, and
  *     codegen short-circuits, so the DP never runs for pairs that
  *     cannot qualify (the q_dedup_edit_screened decision, applied
  *     automatically to any user predicate);
  *  2. the BANDED DP: Spark's thresholded `Levenshtein(a, b, k)`
  *     explores O(len·k) cells instead of O(len²) and returns -1 past
  *     the cap — `>= 0` is exactly `distance <= k`.
  *
  * Null semantics are unchanged: any null input makes both the
  * original and rewritten predicate null — including a NULL
  * THRESHOLD, which needs an explicit IsNull guard around the capped
  * conjunct because Spark's thresholded Levenshtein unboxes a null
  * cap to 0 and returns a non-null -1 (And(NULL, FALSE) would read
  * FALSE, flipping rows under a NOT above the comparison). The
  * rewrite only fires on an UNBOUNDED Levenshtein (threshold =
  * None), so its own output never re-matches. `levenshtein(a,b) < k` rewrites through the
  * equivalent `<= k-1` (integer distances). Strict upper bounds from
  * either side (`k >= lev`, `k > lev`) are normalized the same way.
  *
  * Strict-bound wrap guard: `k - 1` underflows when k = Int.MinValue,
  * turning an always-false predicate near-always-true (non-ANSI) or
  * throwing (ANSI). A foldable k equal to Int.MinValue skips the
  * rewrite entirely; a non-foldable k is wrapped in
  * `k > Int.MinValue AND screened(k-1)` — the And short-circuits
  * before the Subtract evaluates, and null-in-null-out is preserved
  * (null k makes both conjuncts null, as the original was).
  *
  * Registered by [[GraftExtensions]] alongside
  * [[RewriteMembershipJoin]]; `PushLevenshteinScreenSpec` pins the
  * plan shape and result equality on boundary/null/length-gap rows.
  */
object PushLevenshteinScreen extends Rule[LogicalPlan] {

  private def eligible(l: Levenshtein, k: Expression): Boolean =
    l.threshold.isEmpty && l.deterministic && k.deterministic &&
      k.dataType == IntegerType

  private def screened(a: Expression, b: Expression, t: Expression)
      : Expression = {
    val capped = GreaterThanOrEqual(Levenshtein(a, b, Some(t)), Literal(0))
    // null-threshold guard: Spark's thresholded Levenshtein UNBOXES a
    // null cap to 0 (verified against the 4.1.2 bytecode), so the
    // capped conjunct would read non-null FALSE where the original
    // predicate was NULL — And(NULL, FALSE) = FALSE, which diverges
    // from NULL under a NOT above the rewritten comparison. The If
    // restores null-in-null-out; skipped when the cap cannot be null.
    val nullSafe =
      if (t.nullable)
        If(IsNull(t),
          Literal(null, org.apache.spark.sql.types.BooleanType), capped)
      else capped
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), t),
      nullSafe)
  }

  /** `k - 1` for the strict-bound normalization, guarded against
    * Int.MinValue underflow. Foldable k: decrement at rewrite time
    * (None = degenerate `< MinValue`, skip the rewrite — it is
    * already always false/null and never worth screening). Other k:
    * `k > MinValue AND screened(k-1)`; And short-circuits to false
    * before the Subtract can wrap or throw.
    */
  private def strictScreened(
      a: Expression, b: Expression, k: Expression): Option[Expression] =
    k match {
      case Literal(v: Int, IntegerType) =>
        if (v == Int.MinValue) None
        else Some(screened(a, b, Literal(v - 1)))
      case _ =>
        Some(And(
          GreaterThan(k, Literal(Int.MinValue)),
          screened(a, b, Subtract(k, Literal(1)))))
    }

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case LessThanOrEqual(l @ Levenshtein(a, b, None), k) if eligible(l, k) =>
      screened(a, b, k)
    case GreaterThanOrEqual(k, l @ Levenshtein(a, b, None)) if eligible(l, k) =>
      screened(a, b, k)
    case orig @ LessThan(l @ Levenshtein(a, b, None), k) if eligible(l, k) =>
      strictScreened(a, b, k).getOrElse(orig)
    case orig @ GreaterThan(k, l @ Levenshtein(a, b, None)) if eligible(l, k) =>
      strictScreened(a, b, k).getOrElse(orig)
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val newCond = rewrite(cond)
      if (newCond fastEquals cond) f else Filter(newCond, child)
    case j @ Join(left, right, jt, Some(cond), hint) =>
      val newCond = rewrite(cond)
      if (newCond fastEquals cond) j
      else Join(left, right, jt, Some(newCond), hint)
  }
}
