package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named entry in
  * [[queries]]; SQL-expressible ones carry a DuckDB oracle twin in
  * [[oracleSql]] (same column names, same explicit total ORDER BY).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EventQueries.defs("a04_per_user_stats")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. The
    * capped-heap retrieval/bitext family executes under [[HeapScope]]'s
    * child session (the scoped objectHashAggregate fallback raise). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    HeapScope.scope(
      EventQueries.defs ++ RelationalQueries.defs ++ CrawlParityQueries.defs ++
        LauncherQueries.defs ++ PipelineQueries.defs ++ ExtendedQueries.defs ++
        CoverageQueries.defs ++ GraphOps.defs)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EventQueries.oracles ++ RelationalQueries.oracles ++
      CrawlParityQueries.oracles ++ LauncherQueries.oracles ++
      PipelineQueries.oracles ++ ExtendedQueries.oracles ++
      CoverageQueries.oracles ++ GraphOps.oracles
}
