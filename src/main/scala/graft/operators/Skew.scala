package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys (a handful of giant hosts dominates
  * any real crawl stream — the brief's "salting for skew" requirement).
  *
  * Two-phase salted aggregation: spread each key over `salts` partial
  * groups, aggregate, then re-aggregate the partials. AQE's skew-join
  * splitting handles joins; for aggregations map-side partial aggregation
  * usually suffices, but a monster key whose partials still overflow one
  * reducer needs explicit salting — this is that path.
  */
object Skew {

  /** count + sum(valueCol) per key, salted. Result equals the unsalted
    * groupBy exactly (counts/sums are associative).
    */
  def saltedCountSum(df: DataFrame, key: Column, valueCol: Column,
      salts: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(col("key"))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_value"))

  /** Salted distinct-count: exact, two-phase. The salt is `hash(value) mod
    * salts`, which partitions each key's VALUE SPACE: phase 1 computes
    * `countDistinct(v)` per (key, salt) — the hot key's distinct work is
    * spread over `salts` reducers — and phase 2 SUMS the partials, which is
    * exact because a given value always lands in the same salt (the
    * per-salt distinct sets are disjoint). For approximate at extreme
    * scale use approx_count_distinct instead.
    */
  def saltedDistinctCount(df: DataFrame, key: Column, valueCol: Column,
      salts: Int): DataFrame =
    df.select(key.as("key"), pmod(xxhash64(valueCol), lit(salts)).as("__salt"),
        valueCol.as("__v"))
      .groupBy(col("key"), col("__salt"))
      .agg(countDistinct(col("__v")).as("__n")) // phase 1: spread per salt
      .groupBy(col("key"))
      .agg(sum(col("__n")).as("n_distinct")) // phase 2: disjoint → exact sum
}
