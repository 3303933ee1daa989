package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import AsofJoinPlan.AsofJoinNode

/** Catalyst doesn't know how to optimize THROUGH an unknown logical node —
  * it safely leaves [[AsofJoinNode]] alone, which means a wide left table
  * rides whole through the co-partitioning shuffle and sort unless the
  * caller pre-projects. These rules teach the optimizer the two moves that
  * matter at scale:
  *
  *  - **Column pruning**: `Project(cols, asof)` keeps only the left
  *    columns the projection references (plus keys and the timestamp) —
  *    the pruned Project lands below the exchange, and Spark's own rules
  *    then carry it into the scan (`ReadSchema` narrows).
  *  - **Predicate pushdown**: `Filter(cond, asof)` conjuncts that touch
  *    only left-side attributes move below the node — a selective filter
  *    then shrinks the shuffle instead of running after it. Conjuncts on
  *    the produced `asof_*` columns stay above (they depend on the match).
  *
  * Registered in the operator-optimization fixpoint (GraftExtensions) or
  * `experimental.extraOptimizations` (self-registration via
  * [[AsofJoinPlan.enable]]), so they compose with Spark's own
  * pruning/pushdown. Both rewrites are idempotent — required, since an
  * extensions-configured session that also calls `asof()` runs the rule
  * in both batches.
  */
object AsofJoinOptimizations extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // ---- predicate pushdown (left-only conjuncts) -----------------------
    // Only the deterministic PREFIX of the conjunct list may move (same
    // contract as Spark's PushPredicateThroughNonJoin): pushing a
    // deterministic conjunct written AFTER a nondeterministic one would
    // change how many rows the nondeterministic predicate evaluates over.
    case f @ Filter(cond, aj: AsofJoinNode) =>
      val (candidates, nonDeterministic) =
        splitConjunctivePredicates(cond).span(_.deterministic)
      val (pushable, keptDet) = candidates.partition(
        _.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(pushable.reduce(And), aj.left))
        keptDet ++ nonDeterministic match {
          case Nil => pushed
          case ks => Filter(ks.reduce(And), pushed)
        }
      }

    // ---- column pruning (left side) -------------------------------------
    case p @ Project(projectList, aj: AsofJoinNode) =>
      val needed = AttributeSet(projectList.flatMap(_.references)) ++
        AttributeSet(aj.leftKeys.flatMap(_.references)) ++ aj.leftTs.references
      val keep = aj.left.output.filter(needed.contains)
      if (keep.length == aj.left.output.length) p
      else p.copy(child = aj.copy(left = Project(keep, aj.left)))
  }

  /** Idempotent per-session registration (alongside the asof strategy). */
  def enable(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(AsofJoinOptimizations))
      exp.extraOptimizations = exp.extraOptimizations :+ AsofJoinOptimizations
  }
}
