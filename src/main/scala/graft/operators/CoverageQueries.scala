package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CrawlCols
import graft.schema.CrawlSchemas

/** Closing the SURVEY §2 [Q] inventory: operators whose behavior was so far
  * pinned only by ScalaTest get oracle-checked registry entries too —
  * S6 schema-applied JSON scan, P10 start_time split, P20/P21 launch-message
  * construction, F1 variant filter, F5 malformed-target accounting, F8
  * idempotency dedup.
  */
object CoverageQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S6/P1: schema-applied JSONL parsing — build a spec-shaped JSON string,
    // parse under the crawl-spec schema, extract typed fields back.
    "s06_spec_json_scan" -> ((s, d) =>
      Tables.events(s, d)
        .orderBy(col("event_id")).limit(500) // top-k before build+parse
        .withColumn("line", concat(
          lit("""{"id":"""), col("user_id"),
          lit(""","title":"t-"""), lit(""), col("event_id"),
          lit("""","seeds":["https://h"""), col("user_id"),
          lit(""".org/","https://alt"""), col("user_id"),
          lit(""".org/"],"depth":"DEEP","ignoreRobotsTxt":"""),
          (col("user_id") % 2 === 0).cast("string"), lit("}")))
        .withColumn("spec", from_json(col("line"), CrawlSchemas.crawlSpecSchema))
        .select(col("event_id"),
          col("spec.id").as("spec_id"),
          size(col("spec.seeds")).as("n_seeds"),
          element_at(col("spec.seeds"), 1).as("first_seed"),
          col("spec.ignoreRobotsTxt").as("ignore_robots"))
        .orderBy(col("event_id"))),

    // P10: start_time_plus_duration split on synthesized strings, both with
    // and without the +duration suffix.
    "p10_start_time_split" -> ((s, d) =>
      Tables.events(s, d)
        .orderBy(col("event_id")).limit(500) // top-k before format+split
        .withColumn("raw", concat(
          date_format(col("ts"), "yyyyMMddHHmmssSSS"),
          when(col("user_id") % 3 =!= 0,
            concat(lit("+"), col("user_id") % 1000)).otherwise(lit(""))))
        .withColumn("st", CrawlCols.splitStartTime(col("raw")))
        .select(col("event_id"),
          date_format(col("st.start_time"), "yyyy-MM-dd HH:mm:ss.SSS").as("start_time"),
          col("st.duration_ms").as("duration_ms"))
        .orderBy(col("event_id"))),

    // P20/P21: launch-message construction semantics (sheets derivation,
    // source tag, parallel queues) — the JSON envelope is pinned by
    // LauncherSpec; the oracle checks the derived fields.
    "p20_launch_build" -> ((s, d) =>
      Tables.events(s, d)
        .orderBy(col("event_id")).limit(500) // top-k before message build
        .withColumn("scope",
          when(col("user_id") % 3 === 0, "subdomains")
            .when(col("user_id") % 3 === 1, "plus1Scope").otherwise(""))
        .withColumn("depth",
          when(col("event_type") === "click", "CAPPED_LARGE")
            .when(col("event_type") === "error", "DEEP").otherwise("CAPPED"))
        .withColumn("seed",
          when(col("user_id") % 11 === 0,
            concat(lit("https://twitter.com/u"), col("user_id")))
            .otherwise(concat(lit("https://h"), col("user_id"), lit(".org/"))))
        .select(col("event_id"),
          concat(lit("tid:"), col("user_id"), lit(":"), col("seed")).as("source"),
          concat_ws("|", Launcher.sheetsFor(col("user_id") % 2 === 0,
            col("scope"), col("depth"))).as("sheets"),
          when(col("seed").contains("twitter.com"), lit(2)).otherwise(lit(1))
            .as("parallel_queues"))
        .orderBy(col("event_id"))),

    // F1: variant filter via the thread marker (keep-Heritrix).
    "f01_heritrix_filter" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("thread",
          when(col("event_type").isin("click", "view", "purchase"), col("user_id")))
        .filter(col("thread").isNotNull)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    // F5/A6: malformed-target accounting — keep/reject branch counts from
    // one pass (the reference's side counter, made a first-class output).
    "f05_malformed_accounting" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("seeds",
          when(col("user_id") % 13 === 0, array().cast("array<string>"))
            .otherwise(array(concat(lit("https://h"), col("user_id"), lit(".org/")))))
        .groupBy((size(col("seeds")) === 0).as("malformed"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("malformed"))),

    // F8: idempotency dedup by (url, launch_ts) — dropDuplicates semantics
    // with a deterministic canonical row via group-min instead.
    "f08_idempotent_dedup" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("url", concat(lit("https://h"), col("user_id") % 50, lit(".org/")))
        .withColumn("launch_ts", date_format(date_trunc("day", col("ts")), "yyyyMMdd"))
        .groupBy(col("url"), col("launch_ts"))
        .agg(min(col("event_id")).as("first_event"), count(lit(1)).as("n_dups"))
        .orderBy(col("url"), col("launch_ts")))
  )

  val oracles: Map[String, String] = Map(
    "s06_spec_json_scan" ->
      """SELECT event_id, user_id AS spec_id, 2 AS n_seeds,
        |  'https://h' || user_id || '.org/' AS first_seed,
        |  (user_id % 2 = 0) AS ignore_robots
        |FROM events ORDER BY event_id LIMIT 500""".stripMargin,
    "p10_start_time_split" ->
      """SELECT event_id,
        |  strftime(date_trunc('millisecond', CAST(ts AS TIMESTAMP)),
        |           '%Y-%m-%d %H:%M:%S.%g') AS start_time,
        |  CASE WHEN user_id % 3 <> 0 THEN user_id % 1000 END AS duration_ms
        |FROM events ORDER BY event_id LIMIT 500""".stripMargin,
    "p20_launch_build" ->
      """SELECT event_id,
        |  'tid:' || user_id || ':' ||
        |    CASE WHEN user_id % 11 = 0 THEN 'https://twitter.com/u' || user_id
        |         ELSE 'https://h' || user_id || '.org/' END AS source,
        |  concat_ws('|',
        |    CASE WHEN user_id % 2 = 0 THEN 'ignoreRobots' END,
        |    CASE WHEN user_id % 3 = 0 THEN 'subdomainsScope'
        |         WHEN user_id % 3 = 1 THEN 'plus1Scope' END,
        |    CASE WHEN event_type = 'click' THEN 'higherLimit'
        |         WHEN event_type = 'error' THEN 'noLimit' END) AS sheets,
        |  CASE WHEN user_id % 11 = 0 THEN 2 ELSE 1 END AS parallel_queues
        |FROM events ORDER BY event_id LIMIT 500""".stripMargin,
    "f01_heritrix_filter" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE event_type IN ('click', 'view', 'purchase')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "f05_malformed_accounting" ->
      """SELECT (user_id % 13 = 0) AS malformed, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY malformed""".stripMargin,
    "f08_idempotent_dedup" ->
      """SELECT 'https://h' || (user_id % 50) || '.org/' AS url,
        |  strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y%m%d') AS launch_ts,
        |  min(event_id) AS first_event, count(*) AS n_dups
        |FROM events GROUP BY 1, 2 ORDER BY url, launch_ts""".stripMargin
  )
}
