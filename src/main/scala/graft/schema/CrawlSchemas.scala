package graft.schema

import org.apache.spark.sql.types._

/** Schemas for the crawl-event domain (SURVEY.md §1).
  *
  * The reference's schemas are implicit/duck-typed (probe for marker keys —
  * reference report.py:47-49, report.py:108-123); here they are one explicit
  * union `StructType`: variant fields are nullable, variant membership is a
  * null-check predicate (`thread IS NOT NULL` ⇒ Heritrix record,
  * `warc_type IS NOT NULL` ⇒ WebRender record).
  */
object CrawlSchemas {

  /** Crawled-event stream union schema (reference analysis.py:35-59,
    * report.py:64-95, profiled from the 1,000-record fixture).
    * `extra_info` is open-schema — observed values are all strings, so a
    * string map preserves unknown keys without a schema change.
    */
  val crawlEventSchema: StructType = StructType(Seq(
    // common core
    StructField("url", StringType),
    StructField("host", StringType),
    StructField("status_code", IntegerType),
    StructField("content_digest", StringType),
    StructField("content_length", LongType),
    StructField("start_time_plus_duration", StringType),
    StructField("annotations", StringType),
    StructField("warc_filename", StringType),
    StructField("warc_offset", LongType),
    StructField("timestamp", StringType), // ISO-8601 …Z; parsed on demand
    // Heritrix variant (marker: thread)
    StructField("thread", IntegerType),
    StructField("hop_path", StringType),
    StructField("seed", StringType),
    StructField("via", StringType),
    StructField("crawl_name", StringType),
    StructField("size", LongType),
    StructField("mimetype", StringType),
    StructField("extra_info", MapType(StringType, StringType)),
    // WebRender variant (marker: warc_type)
    StructField("http_method", StringType),
    StructField("wire_bytes", LongType),
    StructField("content_type", StringType),
    StructField("warc_length", LongType),
    StructField("warc_content_type", StringType),
    StructField("warc_type", StringType),
    StructField("warc_id", StringType)
  ))

  /** To-crawl request message (constructed by reference enqueue.py:72-124;
    * FIXTURES.md §2). Built with `struct(...)` column expressions and
    * serialized with `to_json` for the Kafka sink.
    */
  val toCrawlSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("parentUrl", StringType),
    StructField("method", StringType),
    StructField("isSeed", BooleanType),
    StructField("forceFetch", BooleanType),
    StructField("hop", StringType),
    StructField("timestamp", StringType),
    StructField("sheets", ArrayType(StringType)),
    StructField("recrawlInterval", LongType),
    StructField("targetSheet", MapType(StringType, StringType)),
    StructField("parentUrlMetadata", StructType(Seq(
      StructField("pathFromSeed", StringType),
      StructField("heritableData", StructType(Seq(
        StructField("source", StringType),
        StructField("refreshDepth", IntegerType),
        StructField("heritable", ArrayType(StringType)),
        StructField("annotations", ArrayType(StringType)),
        StructField("launchTimestamp", StringType),
        StructField("launch_ts", StringType)
      )))
    )))
  ))

  /** Crawl-spec feed (launcher side input — reference README.md:16-39,
    * launcher.py:53-134; FIXTURES.md §3). JSONL, one target per line.
    */
  val crawlSpecSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("seeds", ArrayType(StringType)),
    StructField("depth", StringType),   // CAPPED | CAPPED_LARGE | DEEP
    StructField("scope", StringType),   // subdomains | plus1Scope
    StructField("ignoreRobotsTxt", BooleanType),
    StructField("schedules", ArrayType(StructType(Seq(
      StructField("startDate", StringType), // "yyyy-MM-dd HH:mm:ss"
      StructField("endDate", StringType),   // "" = open-ended
      StructField("frequency", StringType)
    )))),
    StructField("watched", BooleanType),
    StructField("documentUrlScheme", StringType),
    StructField("loginPageUrl", StringType),
    StructField("logoutUrl", StringType),
    StructField("secretId", StringType)
  ))

  /** Typed view of a crawl-spec schedule for the launcher engine. */
  case class Schedule(startDate: String, endDate: String, frequency: String)

  /** Typed view of a crawl-spec row (launcher schedule evaluation is easier
    * typed — SURVEY.md §1.3).
    */
  case class CrawlSpec(
      id: java.lang.Long,
      title: String,
      seeds: Seq[String],
      depth: String,
      scope: String,
      ignoreRobotsTxt: java.lang.Boolean,
      schedules: Seq[Schedule],
      watched: java.lang.Boolean,
      documentUrlScheme: String,
      loginPageUrl: String,
      logoutUrl: String,
      secretId: String)
}
