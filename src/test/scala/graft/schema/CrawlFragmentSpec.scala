package graft.schema

import graft.SparkSpec
import graft.functions.CrawlCols
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-fixture differential tests (SURVEY.md §5.2): parse the reference's
  * 1,000-record crawl-log sample with the union schema and assert the
  * hand-profiled counts from FIXTURES.md. Read-only access to the reference
  * data; nothing is copied into this repo.
  */
class CrawlFragmentSpec extends AnyFunSuite with SparkSpec {

  private val fragmentPath = "/root/reference/crawl_log_fragment.json"

  private lazy val df = {
    val d = spark.read.schema(CrawlSchemas.crawlEventSchema).json(fragmentPath)
    d.cache()
    d
  }

  test("union schema parses every record (no corrupt rows)") {
    assert(df.count() === 1000)
    // url and status_code are the non-null core on every record
    assert(df.filter(col("url").isNull || col("status_code").isNull).count() === 0)
  }

  test("F1: Heritrix variant filter (thread marker) keeps 950 records") {
    assert(df.filter(col("thread").isNotNull).count() === 950)
    assert(df.filter(col("warc_type").isNotNull).count() === 50)
  }

  test("A2: status-code histogram matches hand count") {
    val hist = df.groupBy("status_code").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hist === Map(-5003 -> 838L, 200 -> 128L, 301 -> 11L, 303 -> 9L,
      -6 -> 7L, 204 -> 4L, -5002 -> 3L))
  }

  test("P8: last-hop distribution over Heritrix records") {
    val dist = df.filter(col("thread").isNotNull)
      .groupBy(CrawlCols.lastHop(col("hop_path")).as("h")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist === Map("L" -> 821L, "X" -> 72L, "E" -> 31L, "R" -> 22L,
      "I" -> 1L, "_" -> 3L))
  }

  test("extra_info open map: scopeDecision present on all Heritrix records") {
    assert(df.filter(col("extra_info")("scopeDecision").isNotNull).count() === 950)
  }

  test("P10: start_time_plus_duration parses on every non-null record") {
    // 155 records carry the field (all 17-digit+duration), 845 are null
    val st = df.select(col("start_time_plus_duration").as("raw"),
      CrawlCols.splitStartTime(col("start_time_plus_duration")).as("st"))
    assert(st.filter(col("raw").isNotNull).count() === 155)
    assert(st.filter(col("raw").isNotNull && col("st.start_time").isNull).count() === 0)
    assert(st.filter(col("raw").isNotNull && col("st.duration_ms").isNull).count() === 0)
  }

  test("P2: hostOf agrees with the host field on http(s) records") {
    val mismatch = df
      .filter(col("url").startsWith("http"))
      .filter(CrawlCols.hostOf(col("url")) =!= lower(col("host")))
      .count()
    assert(mismatch === 0)
  }

  test("P16: crawler derivation splits 950/50") {
    val counts = df.groupBy(CrawlCols.crawlerOf(lit(null), col("thread")).as("c"))
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("Heritrix" -> 950L, "WebRender" -> 50L))
  }
}
