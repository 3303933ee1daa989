package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d23: URL-canonicalization dedup. Pins the canonical rule list with
  * literal vectors (positives AND the negatives that prove each rule's
  * guard — https keeps :80? no wait, :80 strips only under http; :8080
  * survives; non-utm queries survive; path case survives), the
  * earliest-(ts, id) keep choice, and partitioning invariance of the
  * min-struct aggregate.
  */
class UrlDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("url")
      .select(DedupOps.canonicalUrl(col("url")).as("c"))
      .head().getString(0)

  test("canonical rule vectors") {
    // fragment stripped
    assert(canon("http://h.example.org/p/1#sec2") === "http://h.example.org/p/1")
    // utm tracking param stripped; content query kept
    assert(canon("http://h.example.org/p/1?utm_source=feed") ===
      "http://h.example.org/p/1")
    assert(canon("http://h.example.org/p/1?q=3") === "http://h.example.org/p/1?q=3")
    // scheme+authority lowercased, path case preserved
    assert(canon("HTTP://Host3.Example.ORG/P/Mixed") ===
      "http://host3.example.org/P/Mixed")
    // http default port stripped — but NOT a non-default port, and NOT
    // https (443 would be https's default; :80 on https is non-default)
    assert(canon("http://h.example.org:80/p/1") === "http://h.example.org/p/1")
    assert(canon("http://h.example.org:8080/p/1") === "http://h.example.org:8080/p/1")
    assert(canon("https://h.example.org:80/p/1") === "https://h.example.org:80/p/1")
    // port stripped when the URL ends at the authority
    assert(canon("http://h.example.org:80") === "http://h.example.org")
    // one trailing slash stripped (incl. the bare-root form)
    assert(canon("http://h.example.org/p/1/") === "http://h.example.org/p/1")
    assert(canon("http://h.example.org/") === "http://h.example.org")
    // the full mess, all rules at once
    assert(canon("HTTP://HOST5.Example.Org:80/p/7/?utm_source=feed#frag") ===
      "http://host5.example.org/p/7")
    // schemeless strings pass through un-lowered (no authority to extract)
    assert(canon("dns:Host3.example.org") === "dns:Host3.example.org")
  }

  test("urlDedup keeps the earliest (ts, id) capture per canonical URL") {
    val rows = Seq(
      // three spellings of one canonical URL; earliest ts wins
      (1L, "2024-01-02 00:00:00", "http://A.example.org/x/"),
      (2L, "2024-01-01 00:00:00", "http://a.example.org:80/x"),
      (3L, "2024-01-03 00:00:00", "http://a.example.org/x#f"),
      // ts tie broken by id
      (5L, "2024-01-01 00:00:00", "http://b.example.org/y"),
      (4L, "2024-01-01 00:00:00", "http://B.example.org/y"),
      // singleton
      (6L, "2024-01-05 00:00:00", "http://c.example.org/z?q=1")
    ).toDF("event_id", "ts_s", "url")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = DedupOps.urlDedup(rows, "url", "ts", "event_id")
      .orderBy("canon_url")
      .select("canon_url", "n_captures", "kept_event_id")
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("http://a.example.org/x", 3L, 2L),
      ("http://b.example.org/y", 2L, 4L),
      ("http://c.example.org/z?q=1", 1L, 6L)))

    // partitioning invariance: the min-struct aggregate's answer cannot
    // depend on the physical layout
    val re = DedupOps.urlDedup(rows.repartition(7), "url", "ts", "event_id")
      .orderBy("canon_url")
      .select("canon_url", "n_captures", "kept_event_id")
      .as[(String, Long, Long)].collect().toSeq
    assert(re === out)
  }
}
