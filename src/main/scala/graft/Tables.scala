package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives a scale-factor directory and
  * loads its inputs through here, so the parquet scan is the single source
  * boundary: Catalyst pushes filters and prunes columns into these scans
  * (verify with `.explain("formatted")` → `PushedFilters` / `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table carries a nanosecond-precision parquet timestamp,
    * which Spark's vectorized reader rejects (PARQUET_TYPE_ILLEGAL). Read it
    * as long nanos and convert to a µs TimestampType column (floor division —
    * matches DuckDB's CAST(ts_ns AS TIMESTAMP) truncation, so oracle compares
    * at µs precision line up).
    */
  def eventsTs(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts DIV 1000)"))
  }

  /** Time-bounded events scan with the range predicate applied to the RAW
    * nanosecond long BEFORE the timestamp conversion, so it reaches the
    * parquet reader as a pushed filter (`PushedFilters: GreaterThanOrEqual/
    * LessThan(ts, …)`) and prunes row groups via min/max stats. Filtering
    * after the conversion defeats pushdown — a full scan at 100 TB.
    * Bounds are [fromIncl, toExcl) in UTC.
    */
  def eventsRange(spark: SparkSession, sfDir: String,
      fromIncl: java.time.Instant, toExcl: java.time.Instant): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, lit}
    def ns(i: java.time.Instant): Long = i.getEpochSecond * 1000000000L + i.getNano
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("ts") >= lit(ns(fromIncl)) && col("ts") < lit(ns(toExcl)))
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsTs(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
