package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketed tables: the join that normally shuffles
  * both fact sides plans with ZERO Exchange when both tables are bucketed
  * on the join key into the same bucket count.
  */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join: no shuffle in the plan, same result") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_buckets")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffled-join code path (no broadcast escape hatch)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = Tables.orders(spark, sfDir)
      val lineitem = Tables.lineitem(spark, sfDir)
      Bucketing.saveBucketed(orders, "b_orders",
        s"$tmp/orders", buckets = 4, keys = Seq("o_orderkey"))
      Bucketing.saveBucketed(lineitem, "b_lineitem",
        s"$tmp/lineitem", buckets = 4, keys = Seq("l_orderkey"))

      val bucketed = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))

      val plan = bucketed.queryExecution.executedPlan.toString
      // the join subtree is co-located: no Exchange between the bucketed
      // scans and the join (the post-join re-agg on o_orderpriority still
      // shuffles — that one is above the join line in the printed tree)
      val lines = plan.linesIterator.toSeq
      val joinAt = lines.indexWhere(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
      assert(joinAt >= 0, s"expected a shuffled-join operator:\n$plan")
      assert(!lines.drop(joinAt).exists(_.contains("Exchange")),
        s"expected a shuffle-free co-located join subtree, got:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)

      // same answer as the plain shuffled join
      val expected = lineitem.join(orders,
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = bucketed.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }
}
