package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Optimizer rule restoring parquet predicate pushdown for time filters on
  * reader-converted timestamp columns: the legacy nanosecond-long encoding
  * (`timestamp_micros(ts DIV 1000)`) and the native TIMESTAMP_NTZ encoding
  * (`CAST(ts AS TIMESTAMP)` under a UTC session) — see [[graft.Tables.eventsTs]]
  * for the two testdata generations.
  *
  * The events table stores int64 nanos; the reader exposes
  * `timestamp_micros(ts DIV 1000)`. A filter on that derived column reaches
  * the scan as only `IsNotNull` — the range predicate is stuck above the
  * conversion, so a bounded time query silently becomes a full scan
  * (observed via explain; the correctness gate can't see it).
  *
  * This rule rewrites comparisons of `timestamp_micros(raw DIV 1000)`
  * against timestamp literals into exact raw-nanosecond comparisons.
  * `DIV` is Spark's IntegralDivide, which truncates TOWARD ZERO (not
  * floor), so the bounds are sign-dependent; with t(ns) = trunc(ns/1000):
  *
  *   t(ns) ≥ A  ⟺  ns ≥ 1000·A            (A > 0)
  *   t(ns) ≥ A  ⟺  ns ≥ 1000·A − 999      (A ≤ 0)
  *   t(ns) ≤ B  ⟺  ns < 1000·B + 1000     (B ≥ 0)
  *   t(ns) ≤ B  ⟺  ns < 1000·B + 1        (B < 0)
  *   strict and equality forms reduce to the above (> A ≡ ≥ A+1 etc.).
  *
  * Both branches are exact for every long ns, pre-epoch (negative)
  * included.
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

  /** Matches `CAST(raw AS TIMESTAMP)` over a TIMESTAMP_NTZ column when the
    * cast zone is UTC — there the NTZ→LTZ conversion is the identity on the
    * underlying micros, so a comparison against a timestamp literal can be
    * rewritten to the raw NTZ column (same micros, NTZ literal) and pushed
    * into the parquet scan. Non-UTC zones are skipped: the wall-clock map is
    * not monotonic across DST transitions, so the unwrap would be inexact.
    * An UNRESOLVED zone (timeZoneId = None) also bails: the rule runs
    * post-analysis where zones are resolved, but if it ever saw an
    * unresolved cast under a non-UTC session, assuming UTC would rewrite
    * with the wrong zone — only a provably-UTC cast unwraps.
    */
  private object UtcNtzCast {
    private def isUtc(tz: String): Boolean =
      try java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC
      catch { case _: Throwable => false }
    def unapply(e: Expression): Option[Expression] = e match {
      case c @ Cast(raw, TimestampType, _, _)
          if raw.dataType == TimestampNTZType && c.timeZoneId.exists(isUtc) =>
        Some(raw)
      case _ => None
    }
  }

  private def ntzLit(micros: Long): Literal = Literal(micros, TimestampNTZType)

  /** µs literals whose ns equivalent (±1000 slack) fits a long — beyond
    * this the multiply would wrap and silently corrupt the predicate, so
    * the rewrite bails out and leaves the original filter in place (no
    * pushdown, still correct).
    */
  private def inNsRange(micros: Long): Boolean =
    micros > Long.MinValue / 1000L + 2L && micros < Long.MaxValue / 1000L - 2L

  /** Exact raw-ns lower bound for t(ns) ≥ micros (truncation-aware). */
  private def geNs(raw: Expression, micros: Long): Expression =
    GreaterThanOrEqual(raw,
      Literal(if (micros > 0) micros * 1000L else micros * 1000L - 999L, LongType))

  /** Exact raw-ns upper bound for t(ns) ≤ micros (truncation-aware). */
  private def leNs(raw: Expression, micros: Long): Expression =
    LessThan(raw,
      Literal(if (micros >= 0) micros * 1000L + 1000L else micros * 1000L + 1L,
        LongType))

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case GreaterThanOrEqual(NsToMicros(raw), Literal(a: Long, TimestampType))
        if inNsRange(a) => geNs(raw, a)
    case GreaterThan(NsToMicros(raw), Literal(a: Long, TimestampType))
        if inNsRange(a) => geNs(raw, a + 1)
    case LessThan(NsToMicros(raw), Literal(b: Long, TimestampType))
        if inNsRange(b) => leNs(raw, b - 1)
    case LessThanOrEqual(NsToMicros(raw), Literal(b: Long, TimestampType))
        if inNsRange(b) => leNs(raw, b)
    case EqualTo(NsToMicros(raw), Literal(c: Long, TimestampType))
        if inNsRange(c) => And(geNs(raw, c), leNs(raw, c))
    // mirrored literal-first forms
    case GreaterThanOrEqual(Literal(b: Long, TimestampType), NsToMicros(raw))
        if inNsRange(b) => leNs(raw, b)
    case GreaterThan(Literal(b: Long, TimestampType), NsToMicros(raw))
        if inNsRange(b) => leNs(raw, b - 1)
    case LessThan(Literal(a: Long, TimestampType), NsToMicros(raw))
        if inNsRange(a) => geNs(raw, a + 1)
    case LessThanOrEqual(Literal(a: Long, TimestampType), NsToMicros(raw))
        if inNsRange(a) => geNs(raw, a)
    case EqualTo(Literal(c: Long, TimestampType), NsToMicros(raw))
        if inNsRange(c) => And(geNs(raw, c), leNs(raw, c))
    // NTZ-cast unwrap (exact, micros-identity under UTC — no slack needed)
    case GreaterThanOrEqual(UtcNtzCast(raw), Literal(a: Long, TimestampType)) =>
      GreaterThanOrEqual(raw, ntzLit(a))
    case GreaterThan(UtcNtzCast(raw), Literal(a: Long, TimestampType)) =>
      GreaterThan(raw, ntzLit(a))
    case LessThan(UtcNtzCast(raw), Literal(b: Long, TimestampType)) =>
      LessThan(raw, ntzLit(b))
    case LessThanOrEqual(UtcNtzCast(raw), Literal(b: Long, TimestampType)) =>
      LessThanOrEqual(raw, ntzLit(b))
    case EqualTo(UtcNtzCast(raw), Literal(c: Long, TimestampType)) =>
      EqualTo(raw, ntzLit(c))
    case GreaterThanOrEqual(Literal(a: Long, TimestampType), UtcNtzCast(raw)) =>
      LessThanOrEqual(raw, ntzLit(a))
    case GreaterThan(Literal(a: Long, TimestampType), UtcNtzCast(raw)) =>
      LessThan(raw, ntzLit(a))
    case LessThan(Literal(b: Long, TimestampType), UtcNtzCast(raw)) =>
      GreaterThan(raw, ntzLit(b))
    case LessThanOrEqual(Literal(b: Long, TimestampType), UtcNtzCast(raw)) =>
      GreaterThanOrEqual(raw, ntzLit(b))
    case EqualTo(Literal(c: Long, TimestampType), UtcNtzCast(raw)) =>
      EqualTo(raw, ntzLit(c))
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
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => TimestampFilterPushdown)
    e.injectOptimizerRule(_ => AsofJoinOptimizations)
    e.injectPlannerStrategy(_ => AsofJoinPlan.AsofJoinStrategy)
  }
}
