package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational engine surface over the TPC-H-ish tables (SURVEY.md §2.5):
  * the reference computes no joins, but the engine provides the full
  * join/set-op/window surface, sized for the 100 TB north star.
  *
  * Scale notes (local[32] tests, 1000-executor design):
  *  - dimension joins (region/nation/customer at any realistic SF for the
  *    dim side) are explicitly `broadcast()` — no shuffle of the fact table;
  *  - fact-fact joins (orders ⋈ lineitem) shuffle on the join key once and
  *    reuse that partitioning for the downstream aggregate where possible;
  *  - aggregates are partial (map-side combine) by construction.
  */
object RelationalQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: full-scan hash aggregate, partial-agg friendly.
    "q01_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // Fact-fact equi-join + group: orders ⋈ lineitem on the natural key.
    // Plan is left to Catalyst/AQE on purpose: at bench SF the filtered
    // orders side auto-broadcasts (BroadcastHashJoin, no lineitem shuffle);
    // past the broadcast threshold both sides shuffle-partition on orderkey
    // — or pre-bucket both tables on orderkey (sources.Bucketing) and the
    // join plans with no exchange at any scale.
    "q03_order_revenue" -> ((s, d) => {
      val o = Tables.orders(s, d).filter(col("o_orderstatus") =!= "F")
      val l = Tables.lineitem(s, d)
      // Aggregation keys are functionally dependent on the join key, so the
      // sum pushes below the join: lineitem partial-aggregates map-side and
      // the join sees one row per orderkey instead of every line item —
      // and its output partitioning (l_orderkey) is reused by the join's
      // shuffle, so the rewrite trades nothing for the smaller exchange.
      val rev = l.groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      rev.join(o, rev("l_orderkey") === o("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(col("rev"), 2).as("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(20)
    }),

    // Multiway join with broadcast dims: region ⋈ nation ⋈ customer ⋈ orders.
    // region/nation/customer are dims → broadcast; only orders stays big.
    "q05_revenue_by_nation" -> ((s, d) => {
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Left-semi join: EXISTS — customers having at least one big order.
    // Expresses the reference's "skip if seen" set logic declaratively.
    "q07_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // Left-anti join: NOT EXISTS — customers with no orders at all.
    "q08_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Full-outer join: completes the join-type surface (inner/left/semi/
    // anti elsewhere) — low-key customers vs big-spender aggregate, with
    // unmatched rows surviving on BOTH sides.
    "q30_full_outer" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .filter(col("c_custkey") <= 300)
        .select(col("c_custkey"), col("c_mktsegment"))
      val big = Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
      c.join(big, c("c_custkey") === big("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          coalesce(col("c_mktsegment"), lit("-")).as("segment"),
          coalesce(col("n_big"), lit(0)).as("n_big"))
        .orderBy(col("custkey"))
    }),

    // Ranking window: top-3 orders per customer (SURVEY §2.5 — the
    // "last N by recency" ranking pattern, A2/A3's deterministic form).
    "q09_topn_per_customer" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Rollup (engine surface beyond the reference — SURVEY §2.4 note):
    // hierarchical totals, null grouping slots coalesced for determinism.
    "q10_status_rollup" -> ((s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("rev"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("rev"))
        .orderBy(col("status"), col("priority"))),

    // Distinct aggregates (free engine surface; reference has none).
    // Written as two-level aggregations rather than
    // `agg(countDistinct, countDistinct, count)`: multiple distinct
    // aggregates plan an Expand that triples every input row before the
    // shuffle. Two-level groupBy partial-aggregates each branch map-side
    // (the orderkey branch carries the row count for free), so the
    // shuffles move only distinct (flag, key) pairs — the standard
    // rewrite that survives high-cardinality keys at scale.
    "q11_distinct_counts" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      // count(DISTINCT x) ignores NULLs — the second-level count must skip
      // the null-key group (which still contributes its rows to n_rows),
      // and a flag whose partkeys are all null must survive the join with
      // n_parts = 0, matching the oracle. TPC-H data is non-null here; the
      // guards keep the operator, not just this dataset, oracle-equal.
      val orders = li
        .groupBy(col("l_returnflag"), col("l_orderkey"))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col("l_returnflag"))
        .agg(count(when(col("l_orderkey").isNotNull, 1)).as("n_orders"),
          sum(col("__n")).as("n_rows"))
      val parts = li
        .select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy(col("l_returnflag"))
        .agg(count(when(col("l_partkey").isNotNull, 1)).as("n_parts"))
      orders.join(parts, Seq("l_returnflag"), "left")
        .select(col("l_returnflag"), col("n_orders"),
          coalesce(col("n_parts"), lit(0L)).as("n_parts"), col("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // Self-join surface: the discovery-graph child.via = parent.url edge
    // (SURVEY §2.5) — modeled on orders⋈customer grouped by nation pairs.
    "q12_union_all" -> ((s, d) => {
      val hi = Tables.orders(s, d).filter(col("o_totalprice") >= 200000)
        .select(col("o_orderkey"), lit("high").as("band"))
      val lo = Tables.orders(s, d).filter(col("o_totalprice") < 200000)
        .select(col("o_orderkey"), lit("low").as("band"))
      hi.unionByName(lo)
        .groupBy(col("band")).agg(count(lit(1)).as("n"))
        .orderBy(col("band"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_order_revenue" ->
      """SELECT o_orderkey, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus <> 'F'
        |GROUP BY o_orderkey, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin,
    "q05_revenue_by_nation" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q07_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q08_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q30_full_outer" ->
      """WITH c AS (
        |  SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 300),
        |b AS (
        |  SELECT o_custkey, count(*) AS n_big FROM orders
        |  WHERE o_totalprice > 400000 GROUP BY o_custkey)
        |SELECT coalesce(c.c_custkey, b.o_custkey) AS custkey,
        |  coalesce(c.c_mktsegment, '-') AS segment,
        |  CAST(coalesce(b.n_big, 0) AS BIGINT) AS n_big
        |FROM c FULL OUTER JOIN b ON c.c_custkey = b.o_custkey
        |ORDER BY custkey""".stripMargin,
    "q09_topn_per_customer" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q10_status_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS rev
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q11_distinct_counts" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
        |       count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q12_union_all" ->
      """SELECT band, count(*) AS n FROM (
        |  SELECT o_orderkey, 'high' AS band FROM orders WHERE o_totalprice >= 200000
        |  UNION ALL
        |  SELECT o_orderkey, 'low' AS band FROM orders WHERE o_totalprice < 200000)
        |GROUP BY band ORDER BY band""".stripMargin
  )
}
