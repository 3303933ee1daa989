package graft

import org.apache.spark.sql.execution.aggregate.TypedAggregateExpression
import org.scalatest.funsuite.AnyFunSuite

/** Drift guard for [[HeapScope.Keys]] (r16 VERDICT #3): the key set is a
  * hand-maintained list, and a capped-heap query registered WITHOUT a
  * Keys entry silently runs at Spark's default 128-key sort fallback —
  * re-inheriting the 84 GB-spill failure mode the scoping exists to
  * prevent, visible only at 100×. This spec inspects every registry
  * entry's ANALYZED plan at fixture scale and asserts exact agreement:
  * a query is in Keys iff its plan carries a capped-heap typed
  * aggregate ([[graft.functions.RetrievalTopKAgg]]/BitextTopKAgg
  * through their shared CappedHeap core, or
  * [[graft.functions.TopKAgg]]).
  *
  * Caveat (documented, accepted): the walk sees the FINAL DataFrame's
  * plan. An iterative builder that ran a capped-heap aggregate in an
  * intermediate driver-loop job (none today) would hide it behind a
  * LogicalRDD leaf — such a query must be scoped at its registration
  * site like any other, and its author owns adding it to Keys.
  */
class HeapScopeSpec extends AnyFunSuite with SparkSpec {

  private val FixtureDir = "/root/testdata/sf0.001"

  /** The capped-heap aggregator families: RetrievalTopKAgg and
    * BitextTopKAgg both instantiate through the shared CappedHeap
    * core's anonymous Aggregator; TopKAgg (d21's group cap) builds its
    * own. Matching on the defining class prefix keeps the guard robust
    * to new rungs of the same families — and deliberately does NOT
    * match other typed aggregators (a04's bounded stats struct is not
    * a capped HEAP and is not scoped). */
  private def isCappedHeapAgg(className: String): Boolean =
    className.startsWith("graft.functions.CappedHeap") ||
      className.startsWith("graft.functions.TopKAgg")

  test("HeapScope.Keys is exactly the registry's capped-heap plans") {
    val found = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df = fn(spark, FixtureDir)
        val capped = df.queryExecution.analyzed.collectWithSubqueries {
          case node => node.expressions.flatMap(_.collect {
            case t: TypedAggregateExpression
                if isCappedHeapAgg(t.aggregator.getClass.getName) => t
          })
        }.flatten
        if (capped.nonEmpty) Some(name) else None
    }.toSet
    val unscoped = found -- HeapScope.Keys
    val overscoped = HeapScope.Keys -- found
    assert(unscoped.isEmpty,
      s"capped-heap queries missing from HeapScope.Keys (would run at " +
        s"the 128-key fallback and re-inherit the spill mode at scale): " +
        s"${unscoped.toSeq.sorted.mkString(", ")}")
    assert(overscoped.isEmpty,
      s"HeapScope.Keys entries whose plans carry no capped-heap " +
        s"aggregate (the raise is an OOM hazard for uncapped object " +
        s"aggregates): ${overscoped.toSeq.sorted.mkString(", ")}")
  }

  test("scoped child session carries the parent's session setup") {
    // r16 ADVICE: newSession() gives a fresh SessionState — the child
    // must re-apply the entrypoints' standard setup (pushdown rule +
    // registered SQL functions) or a future scoped key using either
    // would fail or plan differently only at runtime.
    val child = HeapScope.session(spark)
    assert(child.conf.get(HeapScope.Conf) === HeapScope.Raised)
    assert(child.experimental.extraOptimizations
      .contains(graft.plans.TimestampFilterPushdown),
      "child session lacks TimestampFilterPushdown")
    // a registered SQL function resolves in the child (before the r17
    // fix this threw UNRESOLVED_ROUTINE — fresh SessionState, empty
    // temp-function registry)
    val viaSql = child.sql("SELECT authority_key('example.org') AS h")
      .head().getString(0)
    import org.apache.spark.sql.functions.lit
    val viaColumn = child.range(1)
      .select(graft.functions.CrawlCols.authorityKey(lit("example.org")))
      .head().getString(0)
    assert(viaSql === viaColumn)
    // memoized: same child per parent
    assert(HeapScope.session(spark) eq child)
  }
}
