package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics of the §2.2 scalar library (SURVEY.md), one test per
  * operator with the reference quirks pinned.
  */
class CrawlColsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: (String, String)*) = {
    val df = input.toSeq.toDF("url", "aux")
    df.select(c.as("out")).collect().map(r => Option(r.get(0))).toSeq
  }

  test("P2/P3 hostOf: hostname semantics, dns: scheme, port strip") {
    val got = one(CrawlCols.hostOf(col("url")),
      ("https://WWW.Example.ORG:8443/x?y=1", ""),
      ("dns:Example.org", ""),
      ("http://news.bbc.co.uk/page", ""),
      ("screenshot:", ""))
    assert(got(0) === Some("www.example.org"))
    assert(got(1) === Some("example.org"))
    assert(got(2) === Some("news.bbc.co.uk"))
  }

  test("P4 screenshotOrig: unwrap, null for non-screenshot") {
    val got = one(CrawlCols.screenshotOrig(col("url")),
      ("screenshot:https://a.org/x", ""), ("https://a.org/x", ""), ("screenshot:", ""))
    assert(got === Seq(Some("https://a.org/x"), None, Some("")))
  }

  test("P8 lastHop: empty → '_', else last char") {
    val got = one(CrawlCols.lastHop(col("url")),
      ("LLEPI", ""), ("", ""), ("X", ""))
    assert(got === Seq(Some("I"), Some("_"), Some("X")))
    val nullIn = Seq((null.asInstanceOf[String], "x")).toDF("url", "aux")
      .select(CrawlCols.lastHop(col("url")).as("o")).collect()
    assert(nullIn.head.getString(0) === "_")
  }

  test("P7 waybackTs: digits-only 17-char timestamp") {
    val got = one(CrawlCols.waybackTs(col("url")),
      ("2021-01-16T17:04:10.948Z", ""))
    assert(got === Seq(Some("20210116170410948")))
  }

  test("P9 hourOf: hour truncation of ISO timestamp") {
    val got = one(CrawlCols.hourOf(col("url")).cast("string"),
      ("2021-01-16T17:04:10.948Z", ""))
    assert(got === Seq(Some("2021-01-16 17:00:00")))
  }

  test("P10 splitStartTime: parse + duration; missing '+' → null duration") {
    val df = Seq("20210116170045949+12", "20210116170045949")
      .toDF("s").select(CrawlCols.splitStartTime(col("s")).as("st"))
    val rows = df.select(col("st.start_time").cast("string"), col("st.duration_ms"))
      .collect()
    assert(rows(0) === Row("2021-01-16 17:00:45.949", 12L))
    assert(rows(1).getString(0) === "2021-01-16 17:00:45.949")
    assert(rows(1).isNullAt(1))
  }

  test("P12 annotationsArr: split, trim, drop empties (fixes streamer.py:81)") {
    val got = Seq("ip:1.2.3.4, launchTimestamp:20210116, ,dol:2,")
      .toDF("a").select(CrawlCols.annotationsArr(col("a")).as("o"))
      .collect().head.getSeq[String](0)
    assert(got === Seq("ip:1.2.3.4", "launchTimestamp:20210116", "dol:2"))
    val empty = Seq((null.asInstanceOf[String], "x")).toDF("a", "aux")
      .select(CrawlCols.annotationsArr(col("a")).as("o")).collect().head.getSeq[String](0)
    assert(empty === Seq())
  }

  test("P12 annotationWithPrefix: route ip:/dol:/launchTimestamp:") {
    val df = Seq("ip:34.246.0.237,dol:3,launchTimestamp:20210116170000").toDF("a")
    def get(p: String) = df.select(CrawlCols.annotationWithPrefix(col("a"), p).as("o"))
      .collect().head
    assert(get("ip:").getString(0) === "34.246.0.237")
    assert(get("dol:").getString(0) === "3")
    assert(get("launchTimestamp:").getString(0) === "20210116170000")
    assert(get("missing:").isNullAt(0))
  }

  test("P13 retriesAnnotation: ^\\d+t$ → count") {
    val got = Seq("3t,ip:1.2.3.4", "tt,x").toDF("a")
      .select(CrawlCols.retriesAnnotation(col("a")).as("o")).collect()
    assert(got(0).getLong(0) === 3L)
    assert(got(1).isNullAt(0))
  }

  test("P16 crawlerOf: explicit wins, thread ⇒ Heritrix, else WebRender") {
    val df = Seq(
      ("custom", Some(1)), (null, Some(7)), (null, None)
    ).map { case (c, t) => (c, t.map(Integer.valueOf).orNull) }
      .toDF("crawler", "thread")
    val got = df.select(CrawlCols.crawlerOf(col("crawler"), col("thread")).as("o"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("custom", "Heritrix", "WebRender"))
  }

  test("P14 docId: crawl-log:<ts>/<url>") {
    val got = one(CrawlCols.docId(col("aux"), col("url")),
      ("https://a.org/", "2021-01-16T17:04:10Z"))
    assert(got === Seq(Some("crawl-log:2021-01-16T17:04:10Z/https://a.org/")))
  }

  test("P18 withScheme: prepend http:// only when scheme absent") {
    val got = one(CrawlCols.withScheme(col("url")),
      ("example.com/x", ""), ("https://a.org", ""), ("dns:a.org", ""))
    assert(got === Seq(Some("http://example.com/x"), Some("https://a.org"), Some("dns:a.org")))
  }

  test("P5 nullDash: null → '-' including non-string types") {
    val df = Seq((Some(200), "a"), (None, "b"))
      .map { case (s, x) => (s.map(Integer.valueOf).orNull, x) }
      .toDF("status", "x")
    val got = df.select(CrawlCols.nullDash(col("status")).as("o"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("200", "-"))
  }

  test("P6 logLine: report.py:57 field order with dashes for nulls") {
    val df = Seq(("2021-01-16T17:04:10Z", 200, 341L, "https://a.org/", "LLE",
      "https://parent/", "text/html", 89, "20210116170410123+45",
      "sha1:XYZ", "tid:1:https://a.org/", "ip:1.2.3.4"))
      .toDF("ts", "status", "size", "url", "hop", "via", "mime", "thread",
        "start", "digest", "seed", "ann")
    val line = df.select(CrawlCols.logLine(col("ts"), col("status"),
      col("size"), col("url"), col("hop"), col("via"), col("mime"),
      col("thread"), col("start"), col("digest"), col("seed"), col("ann"))
      .as("o")).collect().head.getString(0)
    assert(line === "2021-01-16T17:04:10Z    200        341 https://a.org/ " +
      "LLE https://parent/ text/html #89 20210116170410123+45 sha1:XYZ " +
      "tid:1:https://a.org/ ip:1.2.3.4")
    // null thread/via render as '-' (post null-swap, like the reference)
    val df2 = Seq(("t", 1)).toDF("ts", "x")
    val line2 = df2.select(CrawlCols.logLine(col("ts"), lit(null), lit(null),
      lit(null), lit(""), lit(null), lit(null), lit(null), lit(null),
      lit(null), lit(null), lit(null)).as("o")).collect().head.getString(0)
    assert(line2 === "t      -          - -  - - #- - - - -")
  }
}
