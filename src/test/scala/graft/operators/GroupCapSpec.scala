package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** d21 family: the bounded top-K aggregator form of the per-group cap must
  * equal the row_number window form exactly — on skewed groups, under
  * repartitioning, and at cap boundaries (cap > |group|, cap == |group|).
  */
class GroupCapSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame, cap: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("p"), col("id"))
    df.withColumn("rn", row_number().over(w))
      .select(col("id"), col("g"),
        when(col("rn") <= cap, col("rn")).cast("int").as("cap_rank"),
        (col("rn") <= cap).as("kept"))
  }

  private def asMap(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => r.getLong(0) ->
      ((r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2),
        r.getBoolean(3)))).toMap

  test("groupCap equals the window form on a skewed corpus") {
    val rnd = new scala.util.Random(7)
    // one monster group (70% of rows), several small ones, one singleton,
    // and one group smaller than the cap
    val rows = (0L until 2000L).map { i =>
      val g = if (i % 10 < 7) "hot"
      else if (i % 10 < 9) s"cold${i % 3}"
      else if (i < 100) "tiny"
      else "mid"
      (i, g, rnd.nextInt(1000).toLong)
    } :+ ((2000L, "singleton", 5L))
    val df = rows.toDF("id", "g", "p")
    for (cap <- Seq(1, 7, 64)) {
      val got = DedupOps.groupCap(df, "g", "id", cap, col("p"))
        .collect()
      val want = windowForm(df, cap).collect()
      assert(got.length === want.length)
      assert(asMap(got) === asMap(want), s"cap=$cap diverged")
    }
  }

  test("groupCap is partitioning-invariant and handles duplicate priorities") {
    // every row shares ONE priority: the id tiebreak must decide alone
    val df = (0L until 300L).map(i => (i, s"g${i % 4}", 42L)).toDF("id", "g", "p")
    val base = asMap(DedupOps.groupCap(df, "g", "id", 10, col("p")).collect())
    for (parts <- Seq(1, 3, 17)) {
      val re = asMap(DedupOps.groupCap(df.repartition(parts), "g", "id", 10,
        col("p")).collect())
      assert(re === base, s"repartition($parts) changed the kept set")
    }
    assert(base === asMap(windowForm(df, 10).collect()))
    // kept ids per group are the 10 smallest ids (priority constant)
    val keptIds = base.toSeq.collect { case (id, (g, _, true)) => (g, id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    for ((g, ids) <- keptIds)
      assert(ids === (0L until 300L).filter(i => s"g${i % 4}" == g).take(10),
        s"group $g kept the wrong ids")
  }

  test("aggregator buffer stays bounded at cap") {
    val agg = graft.functions.TopKAgg.topK(3)
    val entries = (0L until 100L).map(i =>
      graft.functions.TopKAgg.Entry(100L - i, i))
    val b = entries.foldLeft(agg.zero)(agg.reduce)
    assert(b.items.length === 3)
    assert(b.items.map(_.p) === List(1L, 2L, 3L))
    // merge of two full buffers trims back to cap and keeps the smallest
    val b2 = (0L until 50L).map(i => graft.functions.TopKAgg.Entry(i, 1000 + i))
      .foldLeft(agg.zero)(agg.reduce)
    val m = agg.merge(b, b2)
    assert(m.items.length === 3)
    assert(m.items.map(_.p) === List(0L, 1L, 1L))
  }

  test("large cap: deep insert and full-buffer merge stay iterative " +
    "(stack-overflow regression)") {
    val k = 20000
    val agg = graft.functions.TopKAgg.topK(k)
    // ascending priorities: every insert walks the whole kept list (the
    // worst case for a recursive cons walk) and merge interleaves two
    // full k-buffers — the recursive forms overflowed the stack here
    val a = (0L until k.toLong).map(i =>
        graft.functions.TopKAgg.Entry(2 * i, i))
      .foldLeft(agg.zero)(agg.reduce)
    val b = (0L until k.toLong).map(i =>
        graft.functions.TopKAgg.Entry(2 * i + 1, k + i))
      .foldLeft(agg.zero)(agg.reduce)
    val m = agg.merge(a, b)
    assert(m.items.length === k)
    assert(m.items.map(_.p).take(6) === List(0L, 1L, 2L, 3L, 4L, 5L))
  }
}
