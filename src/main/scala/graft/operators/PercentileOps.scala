package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact percentiles (linear interpolation, `percentile` semantics) in a
  * shape that survives 100 TB.
  *
  * Spark's exact `percentile` aggregate buffers EVERY input value of a group
  * in its aggregation buffer (an in-memory counts map), ships that buffer
  * through the shuffle as one fat row, and merges each group's full value
  * multiset inside a single reducer — measured here at sf0.1 as a 5.1 MiB
  * shuffle carried by 6 rows (SHUFFLE_AUDIT.md). The buffer must fit in one
  * task's heap, so the operator fails outright once a group's distinct
  * values no longer fit in memory.
  *
  * This formulation computes the same numbers with bounded memory
  * everywhere:
  *
  *   1. `groupBy(group, value).count()` — map-side combine collapses the
  *      data to distinct (group, value) pairs before anything is shuffled;
  *      a spillable hash aggregate, never a per-row in-memory list.
  *   2. A running `sum(count)` window ordered by value gives each distinct
  *      value its cumulative rank; WindowExec sorts externally (spills to
  *      disk) instead of holding the histogram in one buffer row.
  *   3. An exact percentile is then two bracket lookups: with 0-indexed
  *      fractional position `pos = (n-1)·p`, the bracketing values are the
  *      smallest values whose cumulative count reaches `⌊pos⌋+1` and
  *      `⌈pos⌉+1`, interpolated as `(1-frac)·lo + frac·hi`
  *      (the built-in's formula; pinned bit-for-bit by PercentileOpsSpec).
  *
  * The remaining per-group serial work is the sorted cumsum over DISTINCT
  * values — for bounded-cardinality measures (quantities, status codes,
  * sizes, latencies in ms) that is tiny regardless of row count, and for
  * continuous measures it is disk-backed rather than heap-bound. When value
  * cardinality itself is unbounded at extreme scale, the honest answer is
  * the sketch (`approx_percentile`, a09-style), not an exact rank statistic.
  */
object PercentileOps {

  /** One row per group: `grpCol` plus one unrounded double column per
    * `(percentile, alias)`. Nulls in `valueCol` are ignored, matching the
    * built-in; a group with only nulls disappears (the built-in would
    * return null — callers here never feed all-null groups).
    */
  def exactPercentiles(df: DataFrame, grpCol: String, valueCol: String,
      ps: Seq[(Double, String)]): DataFrame = {
    require(ps.nonEmpty)
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(grpCol), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val cum = counts
      .withColumn("__cum", sum("__c").over(
        Window.partitionBy(grpCol).orderBy("__v")))
      .withColumn("__n", sum("__c").over(Window.partitionBy(grpCol)))
    val aggs = ps.flatMap { case (p, alias) =>
      val pos = (col("__n") - 1) * lit(p) // 0-indexed fractional rank
      Seq(
        min(when(col("__cum") >= floor(pos) + 1, col("__v")))
          .cast("double").as(s"__lo_$alias"),
        min(when(col("__cum") >= ceil(pos) + 1, col("__v")))
          .cast("double").as(s"__hi_$alias"),
        first(pos).as(s"__pos_$alias"))
    }
    val bracketed = cum.groupBy(col(grpCol)).agg(aggs.head, aggs.drop(1): _*)
    val outCols: Seq[Column] = col(grpCol) +: ps.map { case (_, alias) =>
      val lo = col(s"__lo_$alias")
      val hi = col(s"__hi_$alias")
      val frac = col(s"__pos_$alias") - floor(col(s"__pos_$alias"))
      when(hi === lo, lo)
        .otherwise((lit(1.0) - frac) * lo + frac * hi)
        .as(alias)
    }
    bracketed.select(outCols: _*)
  }
}
