package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantics tests (SURVEY.md §5.4): MemoryStream-driven stateful
  * host stats across micro-batches, late/out-of-order events (the case the
  * reference left accidental — ST7), windowed histogram, atomic snapshot.
  */
class AnalysisStreamSpec extends AnyFunSuite with SparkSpec {
  import AnalysisStream._
  import spark.implicits._

  private def ev(host: String, ts: String, status: Int, mime: String = "text/html",
      via: String = null): StatEvent =
    StatEvent(host, java.sql.Timestamp.valueOf(ts), Some(status), Option(mime),
      None, Option(via))

  test("stateful host stats accumulate across micro-batches; late events fold in") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StatEvent]
    val q = hostStats(in.toDS()).writeStream
      .format("memory").queryName("hs").outputMode("update").start()
    try {
      in.addData(
        ev("a.org", "2021-01-16 17:00:00", 200,
          via = "https://b.org/page"),
        ev("a.org", "2021-01-16 17:05:00", 404, mime = "image/png",
          via = "https://a.org/self")) // self-reference: excluded from via
      q.processAllAvailable()
      // batch 2: a late, out-of-order event older than everything seen
      in.addData(ev("a.org", "2021-01-16 16:00:00", 200))
      q.processAllAvailable()

      val last = spark.table("hs").filter(col("host") === "a.org")
        .orderBy(desc("total")).collect().head
      assert(last.getAs[Long]("total") === 3)
      assert(last.getAs[java.sql.Timestamp]("first_ts").toString
        .startsWith("2021-01-16 16:00:00")) // late event moved first_ts back
      assert(last.getAs[java.sql.Timestamp]("last_ts").toString
        .startsWith("2021-01-16 17:05:00"))
      val scs = last.getAs[Map[String, Long]]("statusCodes")
      assert(scs === Map("200" -> 2L, "404" -> 1L))
      val cts = last.getAs[Map[String, Long]]("contentTypes")
      assert(cts === Map("text/html" -> 2L, "image/png" -> 1L))
      val vias = last.getAs[Map[String, Long]]("viaHosts")
      assert(vias === Map("b.org" -> 1L)) // self-via excluded
    } finally q.stop()
  }

  test("status fallback chain: missing mimetype → content_type → unknown; null status → '-'") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StatEvent]
    val q = hostStats(in.toDS()).writeStream
      .format("memory").queryName("hs2").outputMode("update").start()
    try {
      in.addData(
        StatEvent("c.org", java.sql.Timestamp.valueOf("2021-01-16 17:00:00"),
          None, None, Some("application/pdf"), None),
        StatEvent("c.org", java.sql.Timestamp.valueOf("2021-01-16 17:01:00"),
          Some(200), None, None, None))
      q.processAllAvailable()
      val r = spark.table("hs2").orderBy(desc("total")).collect().head
      assert(r.getAs[Map[String, Long]]("contentTypes") ===
        Map("application/pdf" -> 1L, "unknown-content-type" -> 1L))
      assert(r.getAs[Map[String, Long]]("statusCodes") ===
        Map("-" -> 1L, "200" -> 1L))
    } finally q.stop()
  }

  test("windowed status histogram with watermark (A2 deterministic re-spec)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StatEvent]
    val agg = windowedStatusHistogram(
      in.toDS().toDF().withColumn("event_ts", col("event_ts")),
      "10 minutes", "5 minutes", "1 hour")
    val q = agg.writeStream.format("memory").queryName("wh")
      .outputMode("update").start()
    try {
      in.addData(
        ev("a.org", "2021-01-16 17:01:00", 200),
        ev("a.org", "2021-01-16 17:02:00", 200),
        ev("a.org", "2021-01-16 17:07:00", 404))
      q.processAllAvailable()
      val rows = spark.table("wh")
        .filter(col("window_start") === "2021-01-16 17:00:00" &&
          col("status_code") === 200)
        .collect()
      assert(rows.nonEmpty && rows.head.getAs[Long]("n") === 2)
    } finally q.stop()
  }

  test("native session windows: bursts merge, silence splits, append on close") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StatEvent]
    val sessions = AnalysisStream.hostSessions(
      in.toDS().toDF(), "30 minutes", "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      in.addData(
        ev("a.org", "2021-01-16 17:00:00", 200),
        ev("a.org", "2021-01-16 17:20:00", 200), // within gap: same session
        ev("a.org", "2021-01-16 19:00:00", 200)) // ≥30 min silence: new one
      q.processAllAvailable()
      in.addData(ev("b.org", "2021-01-16 23:00:00", 200)) // watermark closer
      q.processAllAvailable()
      val rows = spark.table("sess").filter(col("host") === "a.org")
        .orderBy("session_start").collect()
      assert(rows.length === 2)
      assert(rows(0).getAs[Long]("n_events") === 2L)
      // session extends gap past the LAST merged event
      assert(rows(0).getAs[java.sql.Timestamp]("session_end").toString
        === "2021-01-16 17:50:00.0")
      assert(rows(1).getAs[Long]("n_events") === 1L)
    } finally q.stop()
  }

  test("transformWithState idle-host alert fires on watermark, not arrival") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[StatEvent]
    val q = AnalysisStream.idleHosts(in.toDS(), idleMs = 30 * 60 * 1000L,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("idle")
      .outputMode("append").start()
    try {
      in.addData(
        ev("a.org", "2021-01-16 17:00:00", 200),
        ev("a.org", "2021-01-16 17:05:00", 200),
        ev("b.org", "2021-01-16 17:06:00", 200))
      q.processAllAvailable()
      // nothing idle yet: watermark has not passed last_ts + 30 min
      assert(spark.table("idle").isEmpty)
      // b.org keeps crawling; a.org stays silent → only a.org alerts once
      // the watermark passes 17:05 + 30 min
      in.addData(ev("b.org", "2021-01-16 18:00:00", 200))
      q.processAllAvailable()
      in.addData(ev("b.org", "2021-01-16 18:30:00", 200))
      q.processAllAvailable()
      val alerts = spark.table("idle").collect()
      assert(alerts.map(_.getAs[String]("host")).toSeq === Seq("a.org"))
      assert(alerts.head.getAs[Long]("n_events") === 2L)
      assert(alerts.head.getAs[java.sql.Timestamp]("last_ts").toString
        === "2021-01-16 17:05:00.0")
      // re-arming works: the timer moved with b.org's later events, so no
      // spurious alert for a host that kept reporting
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("top-N snapshot bound + atomic write") {
    val stats = Seq(
      ("a.org", "2021-01-16 17:05:00", 10L),
      ("b.org", "2021-01-16 17:09:00", 5L),
      ("c.org", "2021-01-16 16:00:00", 99L))
      .toDF("host", "last_ts", "total")
      .withColumn("last_ts", to_timestamp(col("last_ts")))
    val top2 = topHostsSnapshot(stats, 2).collect().map(_.getString(0)).toSeq
    assert(top2 === Seq("b.org", "a.org")) // by recency, not volume

    val out = java.nio.file.Files.createTempDirectory("snap")
      .resolve("stats.json").toString
    writeSnapshotAtomic(topHostsSnapshot(stats, 2), out)
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out)), "UTF-8")
    assert(json.startsWith("[") && json.contains("b.org") && !json.contains("c.org"))
  }

  test("snapshotQuery end-to-end: stream → stateful agg → periodic atomic snapshot file") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val in = MemoryStream[StatEvent]
    val dir = java.nio.file.Files.createTempDirectory("snapq")
    val out = dir.resolve("stats.json").toString
    val q = snapshotQuery(hostStats(in.toDS()), out, topN = 500,
      intervalMs = 100L, checkpoint = dir.resolve("ckpt").toString).start()
    try {
      in.addData(ev("a.org", "2021-01-16 17:00:00", 200),
        ev("b.org", "2021-01-16 17:01:00", 404))
      q.processAllAvailable()
      val json = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out)), "UTF-8")
      assert(json.contains("a.org") && json.contains("b.org"))
      assert(json.contains("\"statusCodes\":{\"404\":1}") ||
        json.contains("\"404\":1"))
      // update mode only emits touched hosts per batch — the snapshot must
      // still carry hosts from earlier batches (accumulated view)
      in.addData(ev("c.org", "2021-01-16 17:02:00", 200))
      q.processAllAvailable()
      val json2 = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out)), "UTF-8")
      assert(json2.contains("c.org"))
      assert(json2.contains("a.org") && json2.contains("b.org"),
        "hosts from earlier batches dropped from snapshot")
    } finally q.stop()
  }

  test("host stats idle-TTL transition: timeout evicts state, activity re-arms it") {
    // Timeout semantics verified on the state-transition function directly
    // via TestGroupState (a live ProcessingTimeTimeout query never settles
    // under processAllAvailable/AvailableNow — timeout wakeups keep
    // scheduling batches, so the transition is the testable unit).
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional

    // active update: state written and TTL armed
    val live = TestGroupState.create[HostState](Optional.empty[HostState](),
      GroupStateTimeout.ProcessingTimeTimeout, batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = false)
    val out = updateHostTtl(Some(60000L))("ttl.org",
      Iterator(ev("ttl.org", "2021-01-16 17:00:00", 200)), live).toSeq
    assert(out.map(_.total) === Seq(1L))
    assert(live.exists)
    assert(live.getTimeoutTimestampMs.isPresent &&
      live.getTimeoutTimestampMs.get() === 61000L) // batch time + TTL

    // timeout firing: state evicted, nothing emitted
    val timedOut = TestGroupState.create[HostState](
      Optional.of(HostState(0L, 1L, 5L, Map.empty, Map.empty, Map.empty)),
      GroupStateTimeout.ProcessingTimeTimeout, batchProcessingTimeMs = 100000L,
      eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = true)
    val evicted = updateHostTtl(Some(60000L))("ttl.org", Iterator.empty, timedOut).toSeq
    assert(evicted.isEmpty)
    assert(timedOut.isRemoved)
  }

  test("streaming dedup within watermark: duplicate keys collapse across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StatEvent]
    val deduped = dedupWithinWatermark(
      in.toDS().toDF(), "event_ts", Seq("host"), "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    try {
      in.addData(
        ev("a.org", "2021-01-16 17:00:00", 200),
        ev("a.org", "2021-01-16 17:01:00", 404), // dup key within watermark
        ev("b.org", "2021-01-16 17:02:00", 200))
      q.processAllAvailable()
      in.addData(ev("a.org", "2021-01-16 17:03:00", 500)) // still dup
      q.processAllAvailable()
      val hosts = spark.table("dd").groupBy("host").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(hosts === Map("a.org" -> 1L, "b.org" -> 1L))
    } finally q.stop()
  }

  test("parseCrawlEvents: malformed records flagged, not dropped") {
    val raw = Seq(
      (null.asInstanceOf[Array[Byte]], """{"url":"https://a.org/","status_code":200,"timestamp":"2021-01-16T17:00:00Z","thread":4}""".getBytes("UTF-8")),
      (null.asInstanceOf[Array[Byte]], "not json at all".getBytes("UTF-8")))
      .toDF("key", "value")
    val parsed = CrawlStreams.parseCrawlEvents(raw)
    val rows = parsed.select("url", "malformed", "event_ts").collect()
    assert(rows.length === 2)
    assert(rows.count(_.getBoolean(1)) === 1)
    val good = rows.find(!_.getBoolean(1)).get
    assert(good.getString(0) === "https://a.org/")
    assert(good.getTimestamp(2) !== null)
  }

  test("ST8 restart from checkpoint: state survives a query restart, files not reprocessed") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_restart")
    val inDir = s"$base/in"; val ckpt = s"$base/ckpt"
    new java.io.File(inDir).mkdirs()
    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = new java.io.File(s"$base/$name.tmp")
      val w = new java.io.PrintWriter(tmp)
      lines.foreach(w.println); w.close()
      tmp.renameTo(new java.io.File(s"$inDir/$name.jsonl")) // atomic add
    }
    def run(): Map[String, Long] = {
      val events = spark.readStream
        .schema("host STRING, event_ts TIMESTAMP, status_code INT, " +
          "mimetype STRING, content_type STRING, via STRING")
        .json(inDir)
        .as[AnalysisStream.StatEvent]
      val out = scala.collection.mutable.Map[String, Long]()
      val q = AnalysisStream.hostStats(events).writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[AnalysisStream.HostStatsRow], _: Long) =>
          b.collect().foreach(r => out(r.host) = r.total)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      out.toMap
    }
    try {
      writeBatch("b1", Seq(
        """{"host": "a.org", "event_ts": "2021-01-16T17:00:00.000Z", "status_code": 200}""",
        """{"host": "a.org", "event_ts": "2021-01-16T17:01:00.000Z", "status_code": 404}"""))
      val first = run()
      assert(first === Map("a.org" -> 2L))
      writeBatch("b2", Seq(
        """{"host": "a.org", "event_ts": "2021-01-16T17:02:00.000Z", "status_code": 200}""",
        """{"host": "b.org", "event_ts": "2021-01-16T17:03:00.000Z", "status_code": 200}"""))
      // fresh query instance, same checkpoint: flatMapGroupsWithState state
      // restores (a.org continues from 2, not 1) and b1 is NOT reprocessed
      // (emitted totals come only from the touched hosts of batch 2)
      val second = run()
      assert(second === Map("a.org" -> 3L, "b.org" -> 1L))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
  }

  test("snapshot ranking: null last_ts sorts LAST, never first " +
    "(-Long.MinValue overflow regression)") {
    import AnalysisStream.HostStatsRow
    def row(host: String, ts: String): HostStatsRow =
      HostStatsRow(host,
        null,
        if (ts == null) null else java.sql.Timestamp.valueOf(ts),
        1L, Map.empty, Map.empty, Map.empty)
    val rows = Seq(
      row("never.org", null), // all-null-ts host: the overflow victim
      row("old.org", "2021-01-16 12:00:00"),
      row("new.org", "2021-01-16 18:00:00"),
      row("also-never.org", null))
    val ordered = rows.sorted(AnalysisStream.byRecencyDesc).map(_.host)
    assert(ordered === Seq(
      "new.org", "old.org", "also-never.org", "never.org"))
  }
}
