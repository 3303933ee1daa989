package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule restoring parquet predicate pushdown for time filters on
  * nanosecond-encoded timestamp columns.
  *
  * The events table stores int64 nanos; the reader exposes
  * `timestamp_micros(ts DIV 1000)`. A filter on that derived column reaches
  * the scan as only `IsNotNull` — the range predicate is stuck above the
  * conversion, so a bounded time query silently becomes a full scan
  * (observed via explain; the correctness gate can't see it).
  *
  * This rule rewrites comparisons of `timestamp_micros(raw DIV 1000)`
  * against timestamp literals into exact raw-nanosecond comparisons, using
  * the floor-division equivalences (for any long ns, µs = floor(ns/1000)):
  *
  *   µs ≥ A  ⟺  ns ≥ 1000·A          µs > A  ⟺  ns ≥ 1000·(A+1)
  *   µs < B  ⟺  ns < 1000·B          µs ≤ B  ⟺  ns < 1000·(B+1)
  *   µs = C  ⟺  1000·C ≤ ns < 1000·(C+1)
  *
  * The rewritten predicate references the raw attribute directly, so
  * FileSourceStrategy turns it into `PushedFilters: [GreaterThanOrEqual…]`
  * and parquet row-group stats prune. Registered via [[GraftExtensions]]
  * (injectOptimizerRule) or [[TimestampFilterPushdown.enable]] on a live
  * session (experimental.extraOptimizations — runs before physical
  * planning, which is all pushdown needs).
  */
object TimestampFilterPushdown extends Rule[LogicalPlan] {

  /** Matches timestamp_micros(raw DIV 1000) over a long column. */
  private object NsToMicros {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(raw, Literal(1000L, LongType), _))
          if raw.dataType == LongType => Some(raw)
      case _ => None
    }
  }

  private def nsLit(micros: Long): Literal = Literal(micros * 1000L, LongType)

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case GreaterThanOrEqual(NsToMicros(raw), Literal(a: Long, TimestampType)) =>
      GreaterThanOrEqual(raw, nsLit(a))
    case GreaterThan(NsToMicros(raw), Literal(a: Long, TimestampType)) =>
      GreaterThanOrEqual(raw, nsLit(a + 1))
    case LessThan(NsToMicros(raw), Literal(b: Long, TimestampType)) =>
      LessThan(raw, nsLit(b))
    case LessThanOrEqual(NsToMicros(raw), Literal(b: Long, TimestampType)) =>
      LessThan(raw, nsLit(b + 1))
    case EqualTo(NsToMicros(raw), Literal(c: Long, TimestampType)) =>
      And(GreaterThanOrEqual(raw, nsLit(c)), LessThan(raw, nsLit(c + 1)))
    // mirrored literal-first forms
    case GreaterThanOrEqual(Literal(b: Long, TimestampType), NsToMicros(raw)) =>
      LessThan(raw, nsLit(b + 1))
    case GreaterThan(Literal(b: Long, TimestampType), NsToMicros(raw)) =>
      LessThan(raw, nsLit(b))
    case LessThan(Literal(a: Long, TimestampType), NsToMicros(raw)) =>
      GreaterThanOrEqual(raw, nsLit(a + 1))
    case LessThanOrEqual(Literal(a: Long, TimestampType), NsToMicros(raw)) =>
      GreaterThanOrEqual(raw, nsLit(a))
    case EqualTo(Literal(c: Long, TimestampType), NsToMicros(raw)) =>
      And(GreaterThanOrEqual(raw, nsLit(c)), LessThan(raw, nsLit(c + 1)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val newCond = rewrite(cond)
      if (newCond.fastEquals(cond)) f else Filter(newCond, child)
  }

  /** Enable on a live session (idempotent). */
  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}

/** `SparkSessionExtensions` registration — for
  * `spark.sql.extensions=graft.plans.GraftExtensions` at deployment.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => TimestampFilterPushdown)
}
