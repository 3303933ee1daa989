package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Batch parity queries over the `events` table — the stand-in for the
  * reference's crawled-event Kafka stream (TESTDATA.md). Each query maps a
  * SURVEY.md §2 [Q] operator; the name prefix is the operator id.
  *
  * Determinism rules (SURVEY §5.1): explicit total ORDER BY on every query,
  * timestamps rendered as strings at second precision (parquet ns vs Spark µs
  * truncation must not leak into the compare), double aggregates rounded.
  */
object EventQueries {

  private def events(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  /** Render a timestamp column as a second-precision UTC string. */
  private def tsStr(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2: status-code histogram (reference: analysis.py:149-158 over the last
    // 10k events; batch form = full-table histogram, sorted desc by count).
    "a02_status_histogram" -> ((s, d) =>
      events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("event_type"))),

    // P9 + A8: hour truncation + time-bucketed counts/sums
    // (reference: streamer.py:104-110, test.py:31-41).
    "p09_hourly_rollup" -> ((s, d) =>
      events(s, d)
        .groupBy(tsStr(date_trunc("hour", col("ts"))).as("hour"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("hour"))),

    // A1: global last-event timestamp (analysis.py:90) — event-time max,
    // deterministic (the reference used arrival order; we pin event time).
    "a01_last_event_ts" -> ((s, d) =>
      events(s, d)
        .agg(
          tsStr(max(col("ts"))).as("last_ts"),
          count(lit(1)).as("n"))),

    // A4 (batch form): per-key rolling stats — first/last seen, totals
    // (analysis.py:102-138; host → user_id on the synthetic stream).
    "a04_per_user_stats" -> ((s, d) =>
      events(s, d)
        .groupBy(col("user_id"))
        .agg(
          tsStr(min(col("ts"))).as("first_ts"),
          tsStr(max(col("ts"))).as("last_ts"),
          count(lit(1)).as("total"),
          round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("user_id"))),

    // A5: first-arrival-wins attribute per group (report.py:156-159) —
    // min_by with a total (ts, event_id) ordering instead of arrival order.
    "a05_first_event_type" -> ((s, d) =>
      events(s, d)
        .groupBy(col("user_id"))
        .agg(
          min_by(col("event_type"), struct(col("ts"), col("event_id")))
            .as("first_type"),
          count(lit(1)).as("tot"))
        .orderBy(col("user_id"))),

    // A3: most-recent-N ring buffer (analysis.py:73,161-164) — event-time
    // top-k, ties broken by event_id for a total order.
    "a03_top100_recent" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"), tsStr(col("ts")).as("ts_s"))
        .orderBy(desc("ts_s"), desc("event_id"))
        .limit(100)),

    // F3: stream-variant dispatch (report.py:108-123) — when-chain routing
    // over one union schema, then per-class counts.
    "f03_variant_dispatch" -> ((s, d) =>
      events(s, d)
        .withColumn("variant",
          when(col("event_type").isin("purchase", "signup"), lit("conversion"))
            .when(col("event_type") === "error", lit("error"))
            .otherwise(lit("browse")))
        .groupBy(col("variant"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("variant"))),

    // P1: JSON decode with malformed-record accounting (report.py:45,
    // analysis.py:140-141): from_json yields null on malformed → classify.
    "p01_json_extract" -> ((s, d) =>
      events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .withColumn("parsed", col("k").isNotNull)
        .groupBy(col("parsed"), (col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("parsed"), col("k_mod"))),

    // P1 (open-schema form): parse props as a string→long map — the
    // `extra_info` open-object treatment (SURVEY §1.3): unknown keys need
    // no schema change, lookups are map accesses.
    "p01b_props_map" -> ((s, d) =>
      events(s, d)
        .orderBy(col("event_id")).limit(800) // top-k before the JSON parse
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")))
        .select(col("event_id"),
          element_at(col("m"), "k").as("k"),
          size(col("m")).as("n_keys"))
        .orderBy(col("event_id"))),

    // S5: row limit on scan (report.py:30-31) — limit pushdown
    // (CollectLimitExec; on Kafka this is maxOffsetsPerTrigger).
    "s05_limited_scan" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"), col("event_type"))
        .orderBy(col("event_id"))
        .limit(50)),

    // A7: low-cardinality dims rollup with count + sum(content_length)
    // (streamer.py:64-91 — implementing the evident intent, not the crash).
    "a07_lowcard_rollup" -> ((s, d) =>
      events(s, d)
        .groupBy(col("event_type"), (col("user_id") % 5).as("user_bucket"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("event_type"), col("user_bucket"))),

    // A8: bounded time-range count (test.py:31-41 / streamer.py:134-148) —
    // the range predicate is applied to the raw ns column pre-conversion
    // (Tables.eventsRange) so it reaches the parquet scan as a pushed
    // filter and prunes row groups, the batch analogue of Kafka's
    // offsets-for-times seek.
    "a08_time_range_count" -> ((s, d) =>
      graft.Tables.eventsRange(s, d,
          java.time.Instant.parse("2024-01-02T00:00:00Z"),
          java.time.Instant.parse("2024-01-05T00:00:00Z"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type")))
  )

  val oracles: Map[String, String] = Map(
    "a02_status_histogram" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY n DESC, event_type""".stripMargin,
    "p09_hourly_rollup" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |       count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin,
    "a01_last_event_ts" ->
      """SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
        |       count(*) AS n FROM events""".stripMargin,
    "a04_per_user_stats" ->
      """SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
        |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
        |       count(*) AS total, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a05_first_event_type" ->
      """SELECT user_id, first_type, tot FROM (
        |  SELECT user_id, event_type AS first_type,
        |         count(*) OVER (PARTITION BY user_id) AS tot,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "a03_top100_recent" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
        |FROM events ORDER BY ts_s DESC, event_id DESC LIMIT 100""".stripMargin,
    "f03_variant_dispatch" ->
      """SELECT CASE WHEN event_type IN ('purchase','signup') THEN 'conversion'
        |            WHEN event_type = 'error' THEN 'error'
        |            ELSE 'browse' END AS variant,
        |       count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY variant""".stripMargin,
    "p01_json_extract" ->
      """SELECT CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) IS NOT NULL AS parsed,
        |       CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) % 10 AS k_mod,
        |       count(*) AS n,
        |       CAST(sum(CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1, 2 ORDER BY parsed, k_mod""".stripMargin,
    "p01b_props_map" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) AS k,
        |  1 AS n_keys
        |FROM events ORDER BY event_id LIMIT 800""".stripMargin,
    "s05_limited_scan" ->
      """SELECT event_id, event_type FROM events
        |ORDER BY event_id LIMIT 50""".stripMargin,
    "a07_lowcard_rollup" ->
      """SELECT event_type, user_id % 5 AS user_bucket, count(*) AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, user_bucket""".stripMargin,
    "a08_time_range_count" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-05 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
