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
  * everywhere, for ALL requested measure columns in one scan:
  *
  *   1. explode each row to (group, measure, value) and
  *      `groupBy(group, measure, value).count()` — map-side combine
  *      collapses the data to distinct triples before anything is shuffled;
  *      a spillable hash aggregate, never a per-row in-memory list.
  *   2. A running `sum(count)` window per (group, measure) ordered by value
  *      gives each distinct value its cumulative rank; WindowExec sorts
  *      externally (spills to disk) instead of holding the histogram in one
  *      buffer row. The unordered total-count window shares the same
  *      exchange and sort.
  *   3. An exact percentile is then two bracket lookups: with 0-indexed
  *      fractional position `pos = (n-1)·p`, the bracketing values are the
  *      smallest values whose cumulative count reaches `⌊pos⌋+1` and
  *      `⌈pos⌉+1`, interpolated as `(1-frac)·lo + frac·hi`
  *      (the built-in's formula; pinned bit-for-bit by PercentileOpsSpec).
  *      The bracket min-aggregation is partial (map-side), so the final
  *      shuffle carries one row per (group, partition).
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
    * requested `(percentile, alias)` across all measures. Values are
    * compared as doubles (the built-in also interpolates in double). Nulls
    * in a value column are ignored, matching the built-in; a group whose
    * values are all null disappears (the built-in would return null —
    * callers here never feed all-null groups).
    *
    * Input contract: `df` is read once PER MEASURE (one union branch
    * each) — for a parquet-backed frame that is N column-pruned scans,
    * cheaper than the one-pass explode(array(struct)) form it replaced
    * (which allocated per-row through a generator). Callers passing an
    * expensive computed frame should cache it first; nondeterministic
    * inputs are out of contract (each branch would see its own snapshot).
    */
  def exactPercentilesMulti(df: DataFrame, grpCol: String,
      measures: Seq[(String, Seq[(Double, String)])]): DataFrame = {
    require(measures.nonEmpty && measures.forall(_._2.nonEmpty))
    // One branch per measure, unioned — NOT explode(array(struct(...))):
    // the union stays entirely inside whole-stage codegen (no per-row
    // array/struct allocation, no generator), and each branch's parquet
    // scan prunes to exactly (group, measure) columns. Catalyst dedups the
    // shared scan via exchange reuse where applicable; the per-branch scan
    // cost is a column-pruned read, dwarfed by the shuffle it feeds.
    val exploded = measures.zipWithIndex.map { case ((valueCol, _), mi) =>
      df.select(col(grpCol), lit(mi).as("__m"),
        col(valueCol).cast("double").as("__v"))
        .filter(col("__v").isNotNull)
    }.reduce(_ unionByName _)
    // Two exchanges by design: the histogram groupBy's map-side combine
    // collapses duplicate values BEFORE anything is shuffled, so for
    // bounded-cardinality measures the shuffle carries distinct triples
    // only. (A single-exchange variant — repartition on (group, measure)
    // up front, whose partitioning satisfies both the aggregation and the
    // windows — measured no faster here and ships raw rows, forfeiting
    // that combine at scale.)
    val counts = exploded
      .groupBy(col(grpCol), col("__m"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val byMeasure = Window.partitionBy(grpCol, "__m")
    val cum = counts
      .withColumn("__cum", sum("__c").over(byMeasure.orderBy("__v")))
      .withColumn("__n", sum("__c").over(byMeasure))
    val aggs = measures.zipWithIndex.flatMap { case ((_, ps), mi) =>
      ps.flatMap { case (p, alias) =>
        val mine = col("__m") === mi
        val pos = (col("__n") - 1) * lit(p) // 0-indexed fractional rank
        Seq(
          min(when(mine && col("__cum") >= floor(pos) + 1, col("__v")))
            .as(s"__lo_$alias"),
          min(when(mine && col("__cum") >= ceil(pos) + 1, col("__v")))
            .as(s"__hi_$alias"),
          first(when(mine, pos), ignoreNulls = true).as(s"__pos_$alias"))
      }
    }
    val bracketed = cum.groupBy(col(grpCol)).agg(aggs.head, aggs.drop(1): _*)
    val outCols: Seq[Column] = col(grpCol) +: measures.flatMap(_._2).map {
      case (_, alias) =>
        val lo = col(s"__lo_$alias")
        val hi = col(s"__hi_$alias")
        val frac = col(s"__pos_$alias") - floor(col(s"__pos_$alias"))
        when(hi === lo, lo)
          .otherwise((lit(1.0) - frac) * lo + frac * hi)
          .as(alias)
    }
    bracketed.select(outCols: _*)
  }

  /** Single-measure convenience over [[exactPercentilesMulti]]. */
  def exactPercentiles(df: DataFrame, grpCol: String, valueCol: String,
      ps: Seq[(Double, String)]): DataFrame =
    exactPercentilesMulti(df, grpCol, Seq(valueCol -> ps))
}
