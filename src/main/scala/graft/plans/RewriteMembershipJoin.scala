package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.ArrayType

/** Optimizer rule: turn a membership (`find_in_set`-style) join
  *
  * {{{ A JOIN B ON array_contains(<array from A>, <value from B>) }}}
  *
  * into an explode + EQUI-join:
  *
  * {{{ (A + Generate(Explode(array_distinct(arr)))) JOIN B ON elem = value }}}
  *
  * Spark plans the original as a BroadcastNestedLoopJoin — O(|A|·|B|)
  * comparisons, catastrophic at scale. The rewrite hashes/shuffles on
  * the element instead. `array_distinct` keeps multiplicity semantics
  * identical (one output row per containment, however many duplicate
  * elements the array holds). The rewrite motive is the docs-level
  * theta join in the reference's data model (SURVEY §2.3 J9,
  * docs/datamodel.md:45-62: directors CSV-list membership).
  *
  * Enable per-session via `spark.experimental.extraOptimizations :+=
  * RewriteMembershipJoin`, or cluster-wide with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object RewriteMembershipJoin extends Rule[LogicalPlan] with PredicateHelper {

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      conjuncts.collectFirst {
        case ac @ ArrayContains(arr, value)
            if arr.deterministic && value.deterministic &&
              ((arr.references.subsetOf(left.outputSet) &&
                value.references.subsetOf(right.outputSet)) ||
                (arr.references.subsetOf(right.outputSet) &&
                  value.references.subsetOf(left.outputSet))) => ac
      } match {
        case Some(ac @ ArrayContains(arr, value)) =>
          val arrOnLeft = arr.references.subsetOf(left.outputSet)
          val (arrSide, otherSide) = if (arrOnLeft) (left, right) else (right, left)
          val elemType = arr.dataType.asInstanceOf[ArrayType]
          val elem = AttributeReference("__graft_member_elem",
            elemType.elementType, elemType.containsNull)()
          val generate = Generate(
            Explode(ArrayDistinct(arr)),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(elem), child = arrSide)
          val rest = conjuncts.filterNot(_ eq ac)
          val newCond = (EqualTo(elem, value) +: rest).reduce(And)
          val newJoin =
            if (arrOnLeft) Join(generate, otherSide, Inner, Some(newCond), hint)
            else Join(otherSide, generate, Inner, Some(newCond), hint)
          Project(j.output, newJoin)
        case None => j
      }
  }
}

/** `spark.sql.extensions`-loadable bundle of graft's Catalyst
  * extensions: the membership-join rewrite, the Levenshtein screen
  * pushdown, and EVERY native function in
  * [[graft.functions.GraftFunctions.all]] (SQL-text names like
  * `graft_cosine_sim(a, b)`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteMembershipJoin)
    e.injectOptimizerRule(_ => PushLevenshteinScreen)
    // a cluster configured with this class alone must resolve every
    // advertised native function; the per-session temp registration in
    // each Column entry point only covers sessions that went through
    // the Column API. The inventory is GraftFunctions.all — the same
    // single list the Column entry points and the resolution spec use,
    // so this bundle can no longer drift behind it (it shipped 3-of-8
    // in r18 and was missing all three r19 additions as a hand-kept
    // copy). Shared arity-guarded builders: wrong arg count is a clean
    // WRONG_NUM_ARGS analysis error, not an IndexOutOfBounds.
    graft.functions.GraftFunctions.all.foreach { case (name, clazz, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getCanonicalName, name),
        builder))
    }
  }
}
