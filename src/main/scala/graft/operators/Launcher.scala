package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CrawlCols

/** The scheduled crawl-launch engine (SURVEY.md §3.3): crawl-spec feed →
  * due-schedule evaluation (F5/F6/F7) → seed explosion → launch-message
  * construction (P20/P21) → keyed Kafka-ready frame.
  *
  * The whole pipeline is declarative column algebra over the spec
  * DataFrame — `now` is an injected parameter (reference launcher.py:41-47
  * keeps it injectable; never `now()` inside the plan, so runs are
  * reproducible and testable). At scale the spec feed is small relative to
  * the crawl stream, so this plan has no shuffle at all: filter → explode →
  * project, fully pipelined, partition-parallel over the input file splits.
  */
object Launcher {

  /** F6: schedule-window filter (reference launcher.py:67-84): startDate
    * required and reached; blank/absent endDate = open-ended.
    * Blank strings parse to null via try_to_timestamp, subsuming the
    * reference's falsy-string checks.
    */
  /** The reference's spec dates are strings; parse blank→null once. */
  def parseSpecTs(c: Column): Column =
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss"))

  def inWindow(now: Column, startDate: Column, endDate: Column): Column =
    inWindowParsed(now, parseSpecTs(startDate), parseSpecTs(endDate))

  /** [[inWindow]] over already-parsed timestamps — materialize the parse in
    * a prior projection so each string is decoded once per row, not once
    * per predicate branch (the parse dominates per-row cost otherwise).
    */
  def inWindowParsed(now: Column, sd: Column, ed: Column): Column =
    sd.isNotNull && now >= sd && (ed.isNull || now <= ed)

  /** F7: frequency-due predicate (reference launcher.py:86-134) plus the
    * hour gate (launcher.py:161-163 — written `is`, works by CPython
    * small-int caching; implemented here as plain equality, SURVEY.md §7.5).
    *
    * QUARTERLY/SIXMONTHLY are month CONGRUENCE, not same-quarter: a January
    * schedule fires Jan/Apr/Jul/Oct (month % 3 == startMonth % 3).
    * DOMAINCRAWL and unknown frequencies are never due.
    */
  def frequencyDue(now: Column, startDate: Column, frequency: Column): Column =
    frequencyDueParsed(now, parseSpecTs(startDate), frequency)

  /** [[frequencyDue]] over an already-parsed start timestamp. */
  def frequencyDueParsed(now: Column, sd: Column, frequency: Column): Column = {
    val dayMatch = dayofmonth(now) === dayofmonth(sd)
    val freqOk =
      when(frequency === "DAILY", lit(true))
        .when(frequency === "WEEKLY", dayofweek(now) === dayofweek(sd))
        .when(frequency === "MONTHLY", dayMatch)
        .when(frequency === "QUARTERLY",
          dayMatch && month(now) % 3 === month(sd) % 3)
        .when(frequency === "SIXMONTHLY",
          dayMatch && month(now) % 6 === month(sd) % 6)
        .when(frequency === "ANNUAL", dayMatch && month(now) === month(sd))
        .otherwise(lit(false)) // DOMAINCRAWL / unknown
    freqOk && hour(now) === hour(sd)
  }

  /** Combined due predicate for one (schedule, now) pair. */
  def scheduleDue(now: Column, startDate: Column, endDate: Column,
      frequency: Column): Column =
    inWindow(now, startDate, endDate) && frequencyDue(now, startDate, frequency)

  /** Combined due predicate over pre-parsed timestamps (see
    * [[inWindowParsed]] for why callers should materialize the parse).
    */
  def scheduleDueParsed(now: Column, sd: Column, ed: Column,
      frequency: Column): Column =
    inWindowParsed(now, sd, ed) && frequencyDueParsed(now, sd, frequency)

  /** P21 (reference launcher.py:63-64): `tid:<id>:<first seed>` source tag. */
  def seedSource(id: Column, seeds: Column): Column =
    concat(lit("tid:"), id, lit(":"), element_at(seeds, 1))

  /** Sheet derivation from spec enums (reference launcher.py:174-189). */
  def sheetsFor(ignoreRobotsTxt: Column, scope: Column, depth: Column): Column =
    array_compact(array(
      when(ignoreRobotsTxt, lit("ignoreRobots")),
      when(scope === "subdomains", lit("subdomainsScope"))
        .when(scope === "plus1Scope", lit("plus1Scope")),
      when(depth === "CAPPED_LARGE", lit("higherLimit"))
        .when(depth === "DEEP", lit("noLimit"))))

  /** P20: the nested launch-request message (reference enqueue.py:72-124)
    * as one struct column; `to_json` drops null fields, reproducing the
    * reference's conditional key inclusion (`sheets`, `targetSheet`).
    */
  def launchMessage(seed: Column, source: Column, sheets: Column,
      launchTs: Column, parallelQueues: Column, nowIso: Column): Column = {
    val annotations = array(lit("resetQuotas"),
      concat(lit("launchTimestamp:"), launchTs))
    struct(
      seed.as("url"),
      seed.as("parentUrl"),
      lit("GET").as("method"),
      lit(true).as("isSeed"),
      lit(true).as("forceFetch"),
      lit("").as("hop"),
      when(size(sheets) > 0, sheets).as("sheets"),
      struct(
        lit("").as("pathFromSeed"),
        struct(
          source.as("source"),
          lit(1).as("refreshDepth"),
          array(lit("source"), lit("heritable"), lit("refreshDepth")).as("heritable"),
          annotations.as("annotations"),
          launchTs.as("launchTimestamp"),
          launchTs.as("launch_ts")).as("heritableData")).as("parentUrlMetadata"),
      when(parallelQueues > 1, struct(
        parallelQueues.as("queueAssignmentPolicy.parallelQueues"),
        lit(true).as("queueAssignmentPolicy.parallelQueuesRandomAssignment"),
        lit(false).as("queueAssignmentPolicy.deferToPrevious"))).as("targetSheet"),
      nowIso.as("timestamp"))
  }

  /** Full pipeline: spec frame → one row per due (target, seed) with the
    * serialized message and the murmur3 authority key (P19/ST11).
    *
    * Rejected malformed targets (empty seeds, F5) are observable via
    * [[malformedTargets]] rather than a side counter (A6 — the reference's
    * metrics gauge path is dead code, SURVEY.md §7.5).
    */
  def dueLaunches(specs: DataFrame, now: Timestamp): DataFrame = {
    val nowLit = lit(now)
    val launchTs = date_format(nowLit, "yyyyMMddHHmmss")
    specs
      .filter(size(col("seeds")) > 0) // F5
      .withColumn("source", seedSource(col("id"), col("seeds"))) // P21
      .select(col("id"), col("seeds"), col("source"), col("ignoreRobotsTxt"),
        col("scope"), col("depth"), explode(col("schedules")).as("schedule"))
      .withColumn("__sd", parseSpecTs(col("schedule.startDate")))
      .withColumn("__ed", parseSpecTs(col("schedule.endDate")))
      .filter(scheduleDueParsed(nowLit, col("__sd"), col("__ed"),
        col("schedule.frequency")))
      .drop("__sd", "__ed")
      // a target due under several schedules launches once per reference
      // semantics? No — the reference launches per matching schedule; we
      // keep one row per (target, schedule) to match, then explode seeds.
      .select(col("id"), col("source"), col("ignoreRobotsTxt"), col("scope"),
        col("depth"), explode(col("seeds")).as("seed"))
      .withColumn("sheets",
        sheetsFor(col("ignoreRobotsTxt"), col("scope"), col("depth")))
      .withColumn("parallel_queues",
        when(col("seed").contains("twitter.com"), lit(2)).otherwise(lit(1)))
      .withColumn("launch_ts", launchTs)
      .withColumn("value", to_json(launchMessage(col("seed"), col("source"),
        col("sheets"), col("launch_ts"), col("parallel_queues"),
        date_format(nowLit, "yyyy-MM-dd'T'HH:mm:ss"))))
      .withColumn("key", CrawlCols.authorityKey(CrawlCols.netlocOf(col("seed"))))
      .select(col("id"), col("seed"), col("source"), col("sheets"),
        col("launch_ts"), col("parallel_queues"), col("key"), col("value"))
  }

  /** F5 reject stream: targets with no seeds (reference launcher.py:57-61). */
  def malformedTargets(specs: DataFrame): DataFrame =
    specs.filter(size(col("seeds")) === 0 || col("seeds").isNull)
      .select(col("id"), col("title"))
}

/** Oracle-checked differential query for the schedule predicate: schedules
  * synthesized from the events table, evaluated at a fixed `now`, compared
  * against an independent SQL formulation of the same calendar rules.
  */
object LauncherQueries {
  import org.apache.spark.sql.SparkSession

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f07_schedule_due" -> ((s, d) =>
      graft.Tables.events(s, d)
        // Sort FIRST, on the narrow raw columns: a global orderBy runs its
        // child twice (range-partition sampling pass + the sort itself), so
        // any projection above the sort is computed once, below it twice.
        // The date formatting/parsing dominates this query's per-row cost —
        // keep it in the post-sort (order-preserving) projection.
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
        .withColumn("startDate",
          date_format(col("ts") - expr("INTERVAL 30 DAYS"), "yyyy-MM-dd HH:mm:ss"))
        .withColumn("endDate",
          when(col("user_id") % 4 === 0,
            date_format(col("ts") + expr("INTERVAL 10 DAYS"), "yyyy-MM-dd HH:mm:ss"))
            .otherwise(lit("")))
        .withColumn("frequency",
          when(col("event_type") === "click", "DAILY")
            .when(col("event_type") === "view", "WEEKLY")
            .when(col("event_type") === "signup", "MONTHLY")
            .when(col("event_type") === "purchase", "QUARTERLY")
            .otherwise("ANNUAL"))
        // Materialize the string→timestamp parse once per row; the
        // predicate then reads the parsed attributes (same pipelined
        // codegen stage, ~4× fewer per-row date decodes than inlining
        // the parse into every predicate branch).
        .withColumn("sd", Launcher.parseSpecTs(col("startDate")))
        .withColumn("ed", Launcher.parseSpecTs(col("endDate")))
        .select(col("event_id"),
          Launcher.scheduleDueParsed(
            lit("2024-01-15 13:00:00").cast("timestamp"),
            col("sd"), col("ed"), col("frequency")).as("due"))),

    // F6 isolated: the schedule-window filter alone, including the
    // blank-startDate reject path (reference launcher.py:69-77 skips
    // missing/blank startDate; blank parses to null via try_to_timestamp).
    "f06_window_filter" -> ((s, d) =>
      graft.Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"))
        .orderBy(col("event_id")) // narrow sort first, heavy projection above
        .withColumn("startDate",
          when(col("user_id") % 5 === 0, lit(""))
            .otherwise(date_format(col("ts") - expr("INTERVAL 30 DAYS"),
              "yyyy-MM-dd HH:mm:ss")))
        .withColumn("endDate",
          when(col("user_id") % 4 === 0,
            date_format(col("ts") + expr("INTERVAL 10 DAYS"),
              "yyyy-MM-dd HH:mm:ss"))
            .otherwise(lit("")))
        .select(col("event_id"),
          Launcher.inWindow(lit("2024-01-15 13:00:00").cast("timestamp"),
            col("startDate"), col("endDate")).as("in_window"))),

    // P21 isolated: tid-source tagging from (id, seeds) — array-first
    // semantics (first seed of the seeds list, reference launcher.py:63-64).
    "p21_seed_source" -> ((s, d) =>
      graft.Tables.events(s, d)
        .orderBy(col("event_id")).limit(500)
        .withColumn("seeds", array(
          concat(lit("https://h"), col("user_id"), lit(".org/")),
          concat(lit("https://h"), col("user_id"), lit(".org/about"))))
        .select(col("event_id"),
          Launcher.seedSource(col("user_id"), col("seeds")).as("source"))
        .orderBy(col("event_id"))),

    // A6: launch/error counters (reference launcher.py:51-61, 207-208) —
    // total seeds launched across valid targets plus malformed-target
    // rejects, in ONE scan (the F5 predicate routes each row to a counter;
    // no separate pass per metric).
    "a06_launch_counters" -> ((s, d) => {
      val malformed = size(col("seeds")) === 0 || col("seeds").isNull
      graft.Tables.events(s, d)
        .withColumn("seeds",
          when(col("user_id") % 10 === 0, array().cast("array<string>"))
            .otherwise(array(
              concat(lit("https://h"), col("user_id"), lit(".org/")),
              concat(lit("https://h"), col("user_id"), lit(".org/about")))))
        .agg(
          sum(when(!malformed, size(col("seeds")))).as("i_launches"),
          count(when(malformed, 1)).as("target_errors"))
    })
  )

  val oracles: Map[String, String] = Map(
    "f07_schedule_due" ->
      """WITH s AS (
        |  SELECT event_id,
        |    TIMESTAMP '2024-01-15 13:00:00' AS now,
        |    date_trunc('second', CAST(ts AS TIMESTAMP) - INTERVAL 30 DAY) AS sd,
        |    CASE WHEN user_id % 4 = 0
        |         THEN date_trunc('second', CAST(ts AS TIMESTAMP) + INTERVAL 10 DAY) END AS ed,
        |    CASE event_type WHEN 'click' THEN 'DAILY' WHEN 'view' THEN 'WEEKLY'
        |         WHEN 'signup' THEN 'MONTHLY' WHEN 'purchase' THEN 'QUARTERLY'
        |         ELSE 'ANNUAL' END AS f
        |  FROM events)
        |SELECT event_id,
        |  (now >= sd AND (ed IS NULL OR now <= ed)
        |   AND CASE f WHEN 'DAILY' THEN TRUE
        |        WHEN 'WEEKLY' THEN dayofweek(now) = dayofweek(sd)
        |        WHEN 'MONTHLY' THEN day(now) = day(sd)
        |        WHEN 'QUARTERLY' THEN day(now) = day(sd) AND month(now) % 3 = month(sd) % 3
        |        ELSE day(now) = day(sd) AND month(now) = month(sd) END
        |   AND hour(now) = hour(sd)) AS due
        |FROM s ORDER BY event_id""".stripMargin,

    "f06_window_filter" ->
      """WITH s AS (
        |  SELECT event_id,
        |    TIMESTAMP '2024-01-15 13:00:00' AS now,
        |    CASE WHEN user_id % 5 = 0 THEN NULL
        |         ELSE date_trunc('second', CAST(ts AS TIMESTAMP) - INTERVAL 30 DAY) END AS sd,
        |    CASE WHEN user_id % 4 = 0
        |         THEN date_trunc('second', CAST(ts AS TIMESTAMP) + INTERVAL 10 DAY) END AS ed
        |  FROM events)
        |SELECT event_id,
        |  (sd IS NOT NULL AND now >= sd AND (ed IS NULL OR now <= ed)) AS in_window
        |FROM s ORDER BY event_id""".stripMargin,

    "p21_seed_source" ->
      """SELECT event_id,
        |  'tid:' || user_id || ':' || 'https://h' || user_id || '.org/' AS source
        |FROM events ORDER BY event_id LIMIT 500""".stripMargin,

    "a06_launch_counters" ->
      """WITH s AS (
        |  SELECT CASE WHEN user_id % 10 = 0 THEN 0 ELSE 2 END AS nseeds
        |  FROM events)
        |SELECT CAST(sum(CASE WHEN nseeds > 0 THEN nseeds END) AS BIGINT) AS i_launches,
        |  count(CASE WHEN nseeds = 0 THEN 1 END) AS target_errors
        |FROM s""".stripMargin
  )
}
