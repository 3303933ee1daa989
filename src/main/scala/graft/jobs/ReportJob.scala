package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.CrawlCols

/** The ad-hoc inspection/ETL job (reference report.py, SURVEY.md §3.1):
  * each of the reference's four output formats is a pure
  * `DataFrame → DataFrame` pipeline over the parsed union-schema event
  * frame; sinks (console/file/Solr) are chosen by the caller.
  */
object ReportJob {

  /** `show_raw_stream` (reference report.py:27-37): pass-through projection
    * with the raw JSON preserved.
    */
  def rawStream(events: DataFrame): DataFrame =
    events.select(col("timestamp"), col("url"), col("status_code"))

  /** `show_crawl_log_stream` (reference report.py:40-62): Heritrix-only
    * (F1), null→"-" (P5), fixed-width line (P6).
    */
  def crawlLogStream(events: DataFrame): DataFrame =
    events
      .filter(col("thread").isNotNull) // F1
      .select(CrawlCols.logLine(col("timestamp"), col("status_code"),
        col("size"), col("url"), col("hop_path"), col("via"),
        col("mimetype"), col("thread"), col("start_time_plus_duration"),
        col("content_digest"), col("seed"), col("annotations")).as("line"))

  /** `show_stream` variant dispatch (reference report.py:99-123 / F3):
    * route each record to discovered / crawled / unrecognised.
    */
  def variantOf: Column =
    when(col("parentUrl").isNotNull, lit("discovered"))
      .when(col("status_code").isNotNull, lit("crawled"))
      .otherwise(lit("unrecognised"))

  /** `summarise_stream` (reference report.py:126-165 / A5): per host —
    * total count and the parent URL of the FIRST record (by event time,
    * then a unique tiebreak) whose via-host differs from the record's own
    * host. The reference's "first" is arrival order (nondeterministic);
    * event-time order is the pinned semantics (SURVEY.md §7.4 #1).
    */
  def hostSummary(events: DataFrame): DataFrame = {
    val host = CrawlCols.hostOf(col("url"))
    events
      .filter(col("url").startsWith("http")) // F2
      .withColumn("host", host)
      .withColumn("via_host", CrawlCols.hostOf(col("via")))
      // try_: one malformed timestamp must not kill the whole report
      .withColumn("event_ts", try_to_timestamp(col("timestamp")))
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("tot"),
        expr("min_by(via, struct(event_ts, url)) " +
          "FILTER (WHERE via IS NOT NULL AND via_host IS NOT NULL " +
          "AND via_host <> host)").as("first_via"))
      .select(col("host"), CrawlCols.nullDash(col("first_via")).as("via"),
        col("tot"))
  }

  /** `to_solr_kevals` document ETL (reference report.py:167-224): the full
    * P10–P17 projection chain producing indexable documents:
    * rename timestamp→log_timestamp and seed→source (P15), doc-id synthesis
    * (P14), annotation routing (P12: ip/launchTimestamp/dol, cleaned tag
    * list), start_time+duration split (P10), launch ts parse (P11),
    * crawler derivation (P16), extra_info dropped (P17), wayback ts (P7).
    */
  def solrDocs(events: DataFrame): DataFrame = {
    val st = CrawlCols.splitStartTime(col("start_time_plus_duration"))
    events
      .filter(col("status_code").isNotNull) // crawled variant only
      .withColumn("st", st)
      .select(
        CrawlCols.docId(col("timestamp"), col("url")).as("id"), // P14
        col("timestamp").as("log_timestamp"), // P15
        col("url"),
        CrawlCols.hostOf(col("url")).as("host"),
        col("status_code"),
        col("content_digest"),
        col("content_length"),
        CrawlCols.waybackTs(col("timestamp")).as("wayback_timestamp"), // P7
        col("seed").as("source"), // P15
        CrawlCols.crawlerOf(lit(null), col("thread")).as("crawler"), // P16
        col("st.start_time").as("start_time"), // P10
        col("st.duration_ms").as("duration"),
        CrawlCols.annotationWithPrefix(col("annotations"), "ip:").as("ip"), // P12
        CrawlCols.annotationWithPrefix(col("annotations"), "dol:")
          .cast("long").as("dol"),
        date_format(try_to_timestamp(
          CrawlCols.annotationWithPrefix(col("annotations"), "launchTimestamp:"),
          lit("yyyyMMddHHmmss")), "yyyy-MM-dd'T'HH:mm:ss'Z'")
          .as("launch_timestamp"), // P11
        filter(CrawlCols.annotationsArr(col("annotations")),
          a => !a.startsWith("ip:") && !a.startsWith("launchTimestamp:") &&
            !a.startsWith("dol:")).as("annotations"),
        col("warc_filename"), col("warc_offset")
        // P17: extra_info intentionally not selected
      )
  }
}
