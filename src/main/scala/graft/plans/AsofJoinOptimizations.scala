package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeSet, Expression}
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
  * Both run in `experimental.extraOptimizations` (or via
  * [[GraftExtensions]]), i.e. inside the normal optimizer fixpoint, so
  * they compose with Spark's own pruning/pushdown.
  */
object AsofJoinOptimizations extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // ---- predicate pushdown (left-only conjuncts) -----------------------
    case f @ Filter(cond, aj: AsofJoinNode) =>
      val (pushable, kept) = splitConjuncts(cond).partition(c =>
        c.references.subsetOf(aj.left.outputSet) && c.deterministic)
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left =
          Filter(pushable.reduce(org.apache.spark.sql.catalyst.expressions.And),
            aj.left))
        kept match {
          case Nil => pushed
          case ks => Filter(
            ks.reduce(org.apache.spark.sql.catalyst.expressions.And), pushed)
        }
      }

    // ---- column pruning (left side) -------------------------------------
    case p @ Project(projectList, aj: AsofJoinNode)
        if prunableLeft(projectList, aj).nonEmpty =>
      val keep = requiredLeft(projectList, aj)
      p.copy(child = aj.copy(left = Project(keep, aj.left)))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Left output attributes the projection does NOT need (prunable). */
  private def prunableLeft(refs: Seq[Expression], aj: AsofJoinNode) = {
    val needed = neededLeft(refs, aj)
    aj.left.output.filterNot(needed.contains)
  }

  private def neededLeft(refs: Seq[Expression], aj: AsofJoinNode): AttributeSet =
    AttributeSet(refs.flatMap(_.references)) ++
      AttributeSet(aj.leftKeys.flatMap(_.references)) ++ aj.leftTs.references

  /** Left columns to keep, in original order (output stability). */
  private def requiredLeft(projectList: Seq[Expression],
      aj: AsofJoinNode) = {
    val needed = neededLeft(projectList, aj)
    aj.left.output.filter(needed.contains)
  }

  /** Idempotent per-session registration (alongside the asof strategy). */
  def enable(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraOptimizations.contains(AsofJoinOptimizations))
      exp.extraOptimizations = exp.extraOptimizations :+ AsofJoinOptimizations
  }
}
