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
  * original and rewritten predicate null. The rewrite only fires on
  * an UNBOUNDED Levenshtein (threshold = None), so its own output
  * never re-matches. `levenshtein(a,b) < k` rewrites through the
  * equivalent `<= k-1` (integer distances). Strict upper bounds from
  * either side (`k >= lev`, `k > lev`) are normalized the same way.
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
      : Expression =
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), t),
      GreaterThanOrEqual(Levenshtein(a, b, Some(t)), Literal(0)))

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case LessThanOrEqual(l @ Levenshtein(a, b, None), k) if eligible(l, k) =>
      screened(a, b, k)
    case GreaterThanOrEqual(k, l @ Levenshtein(a, b, None)) if eligible(l, k) =>
      screened(a, b, k)
    case LessThan(l @ Levenshtein(a, b, None), k) if eligible(l, k) =>
      screened(a, b, Subtract(k, Literal(1)))
    case GreaterThan(k, l @ Levenshtein(a, b, None)) if eligible(l, k) =>
      screened(a, b, Subtract(k, Literal(1)))
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
