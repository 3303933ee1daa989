package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream join semantics for launch-to-outcome correlation:
  * time-range-bounded inner matches with latency, and left-outer emission
  * of never-crawled launches once their join state expires.
  */
class CrawlStreamsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("stream-stream join: outcome within horizon matches with latency") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(String, java.sql.Timestamp)]
    val rIn = MemoryStream[(String, java.sql.Timestamp)]
    val joined = CrawlStreams.launchOutcomes(
      lIn.toDF().toDF("url", "launch_ts"),
      rIn.toDF().toDF("crawl_url", "crawl_ts"), "10 minutes")
    val q = joined.writeStream.format("memory").queryName("lo")
      .outputMode("append").start()
    try {
      lIn.addData(
        ("http://a/1", ts("2021-01-16 17:00:00")),
        ("http://a/2", ts("2021-01-16 17:00:00")))
      rIn.addData(
        ("http://a/1", ts("2021-01-16 17:03:00")),  // inside the horizon
        ("http://a/2", ts("2021-01-16 17:30:00")))  // beyond it: no match
      q.processAllAvailable()
      val rows = spark.table("lo").collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[String]("url") === "http://a/1")
      assert(rows.head.getAs[Long]("latency_s") === 180L)
    } finally q.stop()
  }

  test("left-outer: a never-crawled launch emits with nulls after expiry") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(String, java.sql.Timestamp)]
    val rIn = MemoryStream[(String, java.sql.Timestamp)]
    val joined = CrawlStreams.launchOutcomes(
      lIn.toDF().toDF("url", "launch_ts"),
      rIn.toDF().toDF("crawl_url", "crawl_ts"), "10 minutes",
      leftOuter = true)
    val q = joined.writeStream.format("memory").queryName("loo")
      .outputMode("append").start()
    try {
      lIn.addData(("http://dead/1", ts("2021-01-16 17:00:00")))
      q.processAllAvailable()
      // advance BOTH watermarks past launch_ts + horizon so the unmatched
      // launch's state expires and the null-padded row emits
      lIn.addData(("http://closer/l", ts("2021-01-16 18:00:00")))
      rIn.addData(("http://closer/r", ts("2021-01-16 18:00:00")))
      q.processAllAvailable()
      lIn.addData(("http://closer/l2", ts("2021-01-16 19:00:00")))
      rIn.addData(("http://closer/r2", ts("2021-01-16 19:00:00")))
      q.processAllAvailable()
      val dead = spark.table("loo")
        .filter(col("url") === "http://dead/1").collect()
      assert(dead.length === 1)
      assert(dead.head.isNullAt(dead.head.fieldIndex("crawl_ts")))
      assert(dead.head.isNullAt(dead.head.fieldIndex("latency_s")))
    } finally q.stop()
  }
}
