package graft.jobs

import graft.SparkSpec
import graft.schema.CrawlSchemas
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Report pipelines against the reference's 1,000-record golden fragment
  * (read-only): format row counts, Solr-ETL field semantics, host summary
  * first-via determinism.
  */
class ReportJobSpec extends AnyFunSuite with SparkSpec {

  private lazy val events = {
    val d = spark.read.schema(CrawlSchemas.crawlEventSchema)
      .json("/root/reference/crawl_log_fragment.json")
    d.cache()
    d
  }

  test("crawlLogStream: Heritrix-only lines, dashes for nulls") {
    val lines = ReportJob.crawlLogStream(events).collect().map(_.getString(0))
    assert(lines.length === 950) // F1
    assert(lines.forall(_.nonEmpty))
    // null warc fields render as '-', never the string "null"
    assert(!lines.exists(_.contains("null ")))
  }

  test("solrDocs: every crawled record becomes a doc with derived fields") {
    val docs = ReportJob.solrDocs(events)
    assert(docs.count() === 1000)
    assert(!docs.columns.contains("extra_info")) // P17
    val one = docs.filter(col("crawler") === "Heritrix")
      .filter(col("start_time").isNotNull)
      .orderBy(col("id")).limit(1).collect().head
    assert(one.getAs[String]("id").startsWith("crawl-log:20"))
    assert(one.getAs[String]("wayback_timestamp").matches("\\d{17}"))
    // crawler split matches the variant split
    val byCrawler = docs.groupBy("crawler").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCrawler === Map("Heritrix" -> 950L, "WebRender" -> 50L))
    // ip annotations routed out of the tag list
    val withIp = docs.filter(col("ip").isNotNull)
    assert(withIp.count() > 0)
    assert(withIp.filter(array_contains(col("annotations"), "ip:")).count() === 0)
  }

  test("hostSummary: totals match per-host counts; '-' when no external via") {
    val sum = ReportJob.hostSummary(events).collect()
    val tot = sum.map(_.getAs[Long]("tot")).sum
    val httpCount = events.filter(col("url").startsWith("http")).count()
    assert(tot === httpCount)
    // every via is either '-' or a URL on a different host
    sum.foreach { r =>
      val via = r.getAs[String]("via")
      assert(via == "-" || via.startsWith("http") || via.startsWith("dns:"))
    }
  }

  test("variant dispatch: crawled vs unrecognised") {
    val withVariant = events
      .withColumn("parentUrl", lit(null).cast("string"))
      .withColumn("variant", ReportJob.variantOf)
    val counts = withVariant.groupBy("variant").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("crawled" -> 1000L)) // all fragment records have status
  }

  test("streamer time-range: [start, end) on the record's own timestamp, raw lines out") {
    import spark.implicits._
    val raw = Seq(
      """{"timestamp": "2021-01-16T16:59:59.999Z", "url": "http://a/"}""",
      """{"timestamp": "2021-01-16T17:00:00.000Z", "url": "http://b/"}""",
      """{"timestamp": "2021-01-16T17:59:59.000Z", "url": "http://c/"}""",
      """{"timestamp": "2021-01-16T18:00:00.000Z", "url": "http://d/"}""",
      """{"url": "http://no-ts/"}""").toDF("value")
    val got = StreamerMain.timeRange(raw,
      "2021-01-16T17:00:00", "2021-01-16T18:00:00")
      .collect().map(_.getString(0)).toSeq
    // start inclusive, end exclusive, missing-timestamp rows dropped,
    // lines passed through byte-identical
    assert(got === raw.collect().map(_.getString(0)).slice(1, 3).toSeq)
  }
}
