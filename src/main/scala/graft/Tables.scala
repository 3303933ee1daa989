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

  /** The events table's `ts` column has shipped in two parquet encodings
    * across testdata generations: a nanosecond-precision timestamp (which
    * Spark's vectorized reader rejects — PARQUET_TYPE_ILLEGAL — so it is
    * read as long nanos under `legacy.parquet.nanosAsLong` and floor-divided
    * to a µs TimestampType, matching DuckDB's CAST(ts_ns AS TIMESTAMP)
    * truncation) and a native tz-naive microsecond timestamp (TIMESTAMP_NTZ,
    * `isAdjustedToUTC=false`). The NTZ column is cast to TimestampType under
    * the pinned UTC session — a value-identical bijection — so every
    * downstream consumer (`unix_micros`, `cast("long")`, interval arithmetic,
    * as-of joins) sees one stable type regardless of which testdata
    * generation is on disk. [[graft.plans.TimestampFilterPushdown]] unwraps
    * the cast in comparisons so time filters still reach the parquet scan.
    * Branch on the footer schema so either generation loads correctly.
    */
  /** True iff the on-disk `ts` column is a nanosecond-precision parquet
    * timestamp — read straight off the parquet FOOTER (parquet-hadoop, no
    * Spark schema inference, which would itself reject the ns type). Only
    * this generation needs `spark.sql.legacy.parquet.nanosAsLong`; gating
    * the session flag on the footer keeps other parquet reads that hit a
    * ns timestamp failing loudly instead of being silently masked by a
    * table reader's leaked conf.
    */
  private def tsStoredAsNanos(spark: SparkSession, path: String): Boolean = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val hconf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val file =
      if (fs.getFileStatus(p).isDirectory) {
        val parts = fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
        // zero part files (an empty write leaves only _SUCCESS): no
        // footer to branch on — treat as non-nanos and let the normal
        // read path handle the empty table, instead of an opaque
        // empty.minBy crash
        if (parts.isEmpty) return false
        parts.minBy(_.getName)
      } else p
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, hconf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      schema.containsField("ts") &&
        (schema.getType(schema.getFieldIndex("ts")).getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
          case _ => false
        })
    } finally reader.close()
  }

  def eventsTs(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    if (tsStoredAsNanos(spark, path))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path)
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df // native µs TimestampType
    }
  }

  /** Time-bounded events scan with the range predicate applied at the scan
    * column's NATIVE type, so it reaches the parquet reader as a pushed
    * filter (`PushedFilters: GreaterThanOrEqual/LessThan(ts, …)`) and prunes
    * row groups via min/max stats. For the legacy ns-long encoding that
    * means filtering the raw long BEFORE the timestamp conversion — filtering
    * after the conversion defeats pushdown, a full scan at 100 TB. For the
    * native µs encoding a plain timestamp predicate pushes as-is.
    * Bounds are [fromIncl, toExcl) in UTC.
    */
  def eventsRange(spark: SparkSession, sfDir: String,
      fromIncl: java.time.Instant, toExcl: java.time.Instant): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, lit}
    def ns(i: java.time.Instant): Long = i.getEpochSecond * 1000000000L + i.getNano
    val path = s"$sfDir/events.parquet"
    if (tsStoredAsNanos(spark, path))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path)
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.filter(col("ts") >= lit(ns(fromIncl)) && col("ts") < lit(ns(toExcl)))
          .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // filter on the raw NTZ column with NTZ literals (UTC wall-clock of
        // the instant — the session is pinned UTC) so the predicate pushes
        // at the scan's native type; cast to the engine-wide TimestampType
        // only above the filter
        def ntz(i: java.time.Instant): java.time.LocalDateTime =
          java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
        df.filter(col("ts") >= lit(ntz(fromIncl)) && col("ts") < lit(ntz(toExcl)))
          .withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ =>
        df.filter(col("ts") >= lit(java.sql.Timestamp.from(fromIncl)) &&
          col("ts") < lit(java.sql.Timestamp.from(toExcl)))
    }
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
