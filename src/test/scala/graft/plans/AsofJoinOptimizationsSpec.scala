package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Optimizer rules for the custom as-of node: left-side column pruning and
  * predicate pushdown must reach the scan even when the CALLER doesn't
  * pre-project/pre-filter — the "let Catalyst optimize custom operators"
  * contract.
  */
class AsofJoinOptimizationsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // a deliberately WIDE left table (extra columns the query won't use)
  private lazy val wideLeft = Seq(
    (1L, "k1", ts("2024-01-01 10:00:00"), "wide1", 11, 1.5),
    (2L, "k1", ts("2024-01-01 12:00:00"), "wide2", 22, 2.5),
    (3L, "k2", ts("2024-01-01 12:00:00"), "wide3", 33, 3.5)
  ).toDF("id", "k", "ts", "unused_s", "unused_i", "unused_d")

  private lazy val right = Seq(
    ("k1", ts("2024-01-01 09:30:00"), "a"),
    ("k2", ts("2024-01-01 12:00:00"), "c")
  ).toDF("k", "rts", "payload")

  test("column pruning: unused left columns drop out below the node") {
    val q = AsofJoinPlan.asof(wideLeft, right, Seq("k"), "ts", "rts",
        Seq("payload"))
      .select(col("id"), col("asof_payload"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("unused_s"), optimized)
    // results unchanged by the pruning
    val got = q.orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getAs[String]("asof_payload")).toMap
    assert(got === Map(1L -> "a", 2L -> "a", 3L -> "c"))
  }

  test("predicate pushdown: left-only conjuncts move below the node, asof_* stay above") {
    val q = AsofJoinPlan.asof(wideLeft, right, Seq("k"), "ts", "rts",
        Seq("payload"))
      .filter(col("id") >= 2 && col("asof_payload").isNotNull)
    val optimized = q.queryExecution.optimizedPlan
    // the id filter sits below the asof node (on its left child subtree)
    val aj = optimized.collectFirst {
      case n: AsofJoinPlan.AsofJoinNode => n }.get
    assert(aj.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.toString.contains("id") => f }.nonEmpty,
      s"expected the id conjunct below the node:\n$optimized")
    // the asof_payload conjunct must NOT be below the node
    assert(aj.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.toString.contains("asof_payload") => f }.isEmpty)
    val got = q.orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L, 3L)) // id=1 filtered; both have matches
  }

  test("pushdown stops at the first nondeterministic conjunct (span contract)") {
    def asofFiltered(cond: org.apache.spark.sql.Column) =
      AsofJoinPlan.asof(wideLeft, right, Seq("k"), "ts", "rts", Seq("payload"))
        .filter(cond)
    def pushedBelow(q: org.apache.spark.sql.DataFrame): Boolean = {
      val aj = q.queryExecution.optimizedPlan.collectFirst {
        case n: AsofJoinPlan.AsofJoinNode => n }.get
      aj.left.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.toString.contains("id") => f }.nonEmpty
    }
    // n.b. `rand() >= 0` would be range-folded to true by Spark 4's
    // optimizer — the threshold must keep the predicate alive
    // det conjunct BEFORE the nondet one: pushable (deterministic prefix)
    assert(pushedBelow(asofFiltered(col("id") >= 2 && rand() < 0.5)))
    // det conjunct AFTER a nondet one: pushing it would change how many
    // rows rand() evaluates over — must stay above (PushPredicateThroughNonJoin
    // parity)
    assert(!pushedBelow(asofFiltered(rand() < 0.5 && col("id") >= 2)))
  }

  test("pushdown differential on parquet: filter reaches PushedFilters") {
    val d = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, d)
      .select(col("event_id"), (col("user_id") % 100 + 1).as("custkey"),
        col("ts"), col("event_type"), col("props"))
    val ord = graft.Tables.orders(spark, d)
      .groupBy(col("o_custkey").as("custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val q = AsofJoinPlan.asof(ev, ord, Seq("custkey"), "ts", "o_orderdate",
        Seq("o_orderkey"))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("asof_o_orderkey"))
    val physical = q.queryExecution.executedPlan.toString
    // event_type filter reached the events parquet scan; props was pruned
    assert(physical.contains("PushedFilters") &&
      physical.contains("EqualTo(event_type,click)"), physical)
    assert(!physical.contains("props"), physical)
  }
}
