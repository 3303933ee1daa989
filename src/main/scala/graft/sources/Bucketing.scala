package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table layout for co-located joins — the storage-side half of
  * the 100 TB join strategy.
  *
  * A fact-fact equi-join (e.g. lineitem ⋈ orders on orderkey, q03) costs a
  * full shuffle of both sides every query. Persisting both tables bucketed
  * by the join key into the same bucket count makes the join shuffle-FREE
  * forever after: each scan task reads exactly one bucket file set, Spark
  * recognizes the matching `HashPartitioning(key, n)` on both sides and
  * plans the sort-merge join with no Exchange. Amortizes one write-side
  * shuffle across every subsequent join/aggregation on that key — on a
  * 1000-executor cluster this is the difference between a network-bound
  * and an IO-bound pipeline. (`sortBy` additionally pre-orders each bucket
  * file so the merge side can skip or shrink its sort.)
  */
object Bucketing {

  /** Write `df` as an external parquet table bucketed (and sorted) by
    * `keys` into `buckets` buckets at `path`, registered as `table` in the
    * session catalog. Overwrites both table and data.
    */
  def saveBucketed(df: DataFrame, table: String, path: String, buckets: Int,
      keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "bucketing requires at least one key")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }
}
