package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-restart coverage for the round-5 streaming operators
  * (VERDICT r5 #7, the ST8 treatment hostStats already has): join state
  * and transformWithState value-state + timers must survive a stop/start
  * from the same checkpoint — an operator that silently loses state on
  * restart mis-reports instead of failing. Plus the ADVICE r5 pin that
  * `lateness` (watermark delay) and `horizon` (join time range) are
  * genuinely independent knobs on [[CrawlStreams.launchOutcomes]].
  */
class StreamRestartSpec extends AnyFunSuite with SparkSpec {
  import AnalysisStream._
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def ev(host: String, t: String): StatEvent =
    StatEvent(host, ts(t), Some(200), Some("text/html"), None, None)

  /** foreachBatch sink collecting into a buffer: the memory sink refuses
    * checkpoint recovery, and restart-survival is exactly what these tests
    * exercise.
    */
  private def collectingSink(df: org.apache.spark.sql.DataFrame,
      ckpt: String, buf: scala.collection.concurrent.TrieMap[Long, Array[org.apache.spark.sql.Row]]) =
    df.writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => { buf.put(id, batch.collect()); () })
      .option("checkpointLocation", ckpt)
      .outputMode("append")

  test("launchOutcomes: a launch buffered before restart matches a result after it") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(String, java.sql.Timestamp)]
    val rIn = MemoryStream[(String, java.sql.Timestamp)]
    val joined = CrawlStreams.launchOutcomes(
      lIn.toDF().toDF("url", "launch_ts"),
      rIn.toDF().toDF("crawl_url", "crawl_ts"), "10 minutes")
    val ckpt = java.nio.file.Files.createTempDirectory("lo-ckpt").toString
    val buf = new scala.collection.concurrent.TrieMap[Long, Array[org.apache.spark.sql.Row]]

    val q1 = collectingSink(joined, ckpt, buf).start()
    try {
      lIn.addData(("http://a/1", ts("2021-01-16 17:00:00")))
      q1.processAllAvailable()
      assert(buf.values.flatten.isEmpty) // no outcome yet
    } finally q1.stop()

    // restart from the checkpoint: the buffered launch must still be in
    // join state, so a result INSIDE its horizon matches post-restart
    val q2 = collectingSink(joined, ckpt, buf).start()
    try {
      rIn.addData(("http://a/1", ts("2021-01-16 17:03:00")))
      q2.processAllAvailable()
      val rows = buf.values.flatten.toArray
      assert(rows.length === 1, "join state lost across restart")
      assert(rows.head.getAs[String]("url") === "http://a/1")
      assert(rows.head.getAs[Long]("latency_s") === 180L)
    } finally q2.stop()
  }

  test("idleHosts: value state and event-time timers survive a restart") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[StatEvent]
    val idle = AnalysisStream.idleHosts(in.toDS(),
      idleMs = 30 * 60 * 1000L, watermark = "10 minutes")
    val ckpt = java.nio.file.Files.createTempDirectory("idle-ckpt").toString
    val buf = new scala.collection.concurrent.TrieMap[Long, Array[org.apache.spark.sql.Row]]

    val q1 = collectingSink(idle.toDF(), ckpt, buf).start()
    try {
      in.addData(ev("a.org", "2021-01-16 17:00:00"),
        ev("a.org", "2021-01-16 17:05:00"),
        ev("b.org", "2021-01-16 17:06:00"))
      q1.processAllAvailable()
      assert(buf.values.flatten.isEmpty) // nothing idle yet
    } finally q1.stop()

    // restart: a.org goes silent, only b.org traffic advances the
    // watermark past a.org's deadline — the alert must carry the
    // PRE-restart state (2 events, last_ts 17:05)
    val q2 = collectingSink(idle.toDF(), ckpt, buf).start()
    try {
      in.addData(ev("b.org", "2021-01-16 18:00:00"))
      q2.processAllAvailable()
      in.addData(ev("b.org", "2021-01-16 18:30:00"))
      q2.processAllAvailable()
      val alerts = buf.values.flatten.toArray
      assert(alerts.map(_.getAs[String]("host")).toSeq === Seq("a.org"),
        "timer or value state lost across restart")
      assert(alerts.head.getAs[Long]("n_events") === 2L)
      assert(alerts.head.getAs[java.sql.Timestamp]("last_ts").toString
        === "2021-01-16 17:05:00.0")
    } finally {
      q2.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("lateness below the horizon is rejected up front") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(String, java.sql.Timestamp)]
    val rIn = MemoryStream[(String, java.sql.Timestamp)]
    // a tighter watermark than the join window would drop in-horizon
    // stragglers pre-join — the conflation the knob exists to fix
    val e = intercept[IllegalArgumentException] {
      CrawlStreams.launchOutcomes(
        lIn.toDF().toDF("url", "launch_ts"),
        rIn.toDF().toDF("crawl_url", "crawl_ts"), "10 minutes",
        lateness = Some("1 minute"))
    }
    assert(e.getMessage.contains("must be >= horizon"))
  }

  test("lateness == horizon: a result straggling past the watermark is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(String, java.sql.Timestamp)]
    val rIn = MemoryStream[(String, java.sql.Timestamp)]
    val joined = CrawlStreams.launchOutcomes(
      lIn.toDF().toDF("url", "launch_ts"),
      rIn.toDF().toDF("crawl_url", "crawl_ts"), "10 minutes")
    val q = joined.writeStream.format("memory").queryName("lo_tight")
      .outputMode("append").start()
    try {
      lIn.addData(("http://a/1", ts("2021-01-16 17:00:00")),
        ("http://a/keepopen", ts("2021-01-16 18:10:00")))
      // result-stream watermark advances to 18:00 - 10min = 17:50 ...
      rIn.addData(("http://other/x", ts("2021-01-16 18:00:00")))
      q.processAllAvailable()
      // ... so a matching result at 17:03 (inside the horizon, but 57 min
      // behind the result watermark) is discarded as late
      rIn.addData(("http://a/1", ts("2021-01-16 17:03:00")))
      q.processAllAvailable()
      assert(spark.table("lo_tight").collect()
        .count(_.getAs[String]("url") === "http://a/1") === 0)
    } finally q.stop()
  }

  test("lateness > horizon: the same straggler matches without widening the join") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(String, java.sql.Timestamp)]
    val rIn = MemoryStream[(String, java.sql.Timestamp)]
    val joined = CrawlStreams.launchOutcomes(
      lIn.toDF().toDF("url", "launch_ts"),
      rIn.toDF().toDF("crawl_url", "crawl_ts"), "10 minutes",
      lateness = Some("2 hours"))
    val q = joined.writeStream.format("memory").queryName("lo_slack")
      .outputMode("append").start()
    try {
      lIn.addData(("http://a/1", ts("2021-01-16 17:00:00")),
        ("http://a/keepopen", ts("2021-01-16 18:10:00")))
      rIn.addData(("http://other/x", ts("2021-01-16 18:00:00")))
      q.processAllAvailable()
      // watermark is now 16:00 (2h delay): the 17:03 straggler is accepted
      rIn.addData(("http://a/1", ts("2021-01-16 17:03:00")))
      q.processAllAvailable()
      val hit = spark.table("lo_slack").collect()
        .filter(_.getAs[String]("url") === "http://a/1")
      assert(hit.length === 1, "in-horizon straggler should match under wider lateness")
      assert(hit.head.getAs[Long]("latency_s") === 180L)
      // the join window itself did NOT widen: an outcome past the horizon
      // still never matches
      rIn.addData(("http://a/keepopen", ts("2021-01-16 18:40:00"))) // 30 min later
      q.processAllAvailable()
      assert(spark.table("lo_slack").collect()
        .count(_.getAs[String]("url") === "http://a/keepopen") === 0)
    } finally q.stop()
  }

  test("leakageByWindow: both stacked aggregation states survive a restart") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.DedupOps
    val bench = Seq((0L, "a b c d")).toDF("doc_id", "text")
    val benchSet = DedupOps.benchShingleSet(bench, "text", 3)
    val in = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    val mon = PipelineStreams.leakageByWindow(
      in.toDF().toDF("doc_id", "ts", "source", "text"), benchSet,
      "ts", "source", "doc_id", "text", "10 minutes", "5 minutes")
    val ckpt = java.nio.file.Files.createTempDirectory("lw-ckpt").toString
    val buf = new scala.collection.concurrent.TrieMap[Long, Array[org.apache.spark.sql.Row]]

    val q1 = collectingSink(mon, ckpt, buf).start()
    try {
      // a contaminated doc lands in the open window, no emission yet
      in.addData((10L, ts("2021-01-16 17:00:00"), "web", "x a b c y"))
      q1.processAllAvailable()
      assert(buf.values.flatten.isEmpty)
    } finally q1.stop()

    // restart: the (window, source, doc) flag AND the (window, source)
    // rollup state must both rehydrate — a clean doc joins the same
    // window, then the watermark closes it with the COMBINED counts
    val q2 = collectingSink(mon, ckpt, buf).start()
    try {
      in.addData((11L, ts("2021-01-16 17:01:00"), "web", "novel clean words"))
      q2.processAllAvailable()
      in.addData((99L, ts("2021-01-16 17:40:00"), "late", "x"))
      q2.processAllAvailable()
      val web = buf.values.flatten.toArray
        .filter(_.getAs[String]("source") === "web")
      assert(web.length === 1, "window state lost across restart")
      assert(web.head.getAs[Long]("n_docs") === 2L)
      assert(web.head.getAs[Long]("n_contaminated") === 1L)
      assert(web.head.getAs[Long]("contam_milli") === 500L)
    } finally q2.stop()
  }
}
