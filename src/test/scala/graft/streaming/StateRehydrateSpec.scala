package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** ST8 restart completion: host state read back from the checkpoint's state
  * store, and the snapshot file re-published from it on restart — before
  * any new traffic arrives (update mode alone would leave the file empty
  * until every host was touched again).
  */
class StateRehydrateSpec extends AnyFunSuite with SparkSpec {
  import AnalysisStream._
  import spark.implicits._

  private def ev(host: String, ts: String, status: Int): StatEvent =
    StatEvent(host, java.sql.Timestamp.valueOf(ts), Some(status),
      Some("text/html"), None, None)

  test("rehydrateHostStats reads keyed state back from a stopped checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StatEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("rehyd-ckpt").toString
    val q = hostStats(in.toDS()).writeStream
      .format("memory").queryName("rehyd")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      in.addData(ev("a.org", "2021-01-16 17:00:00", 200),
        ev("a.org", "2021-01-16 17:05:00", 404),
        ev("b.org", "2021-01-16 17:01:00", 200))
      q.processAllAvailable()
    } finally q.stop()

    val rows = rehydrateHostStats(spark, ckpt).collect()
      .map(r => r.host -> r).toMap
    assert(rows.keySet === Set("a.org", "b.org"))
    assert(rows("a.org").total === 2L)
    assert(rows("a.org").first_ts.toString.startsWith("2021-01-16 17:00:00"))
    assert(rows("a.org").last_ts.toString.startsWith("2021-01-16 17:05:00"))
    assert(rows("a.org").statusCodes === Map("200" -> 1L, "404" -> 1L))
    assert(rows("b.org").total === 1L)
  }

  test("snapshotQuery seeds and publishes the snapshot from a checkpoint on restart") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sp = spark
    val in = MemoryStream[StatEvent]
    val dir = java.nio.file.Files.createTempDirectory("rehyd-snap")
    val out = dir.resolve("stats.json").toString
    val ckpt = dir.resolve("ckpt").toString
    val q = snapshotQuery(hostStats(in.toDS()), out, topN = 500,
      intervalMs = 100L, checkpoint = ckpt).start()
    try {
      in.addData(ev("a.org", "2021-01-16 17:00:00", 200),
        ev("b.org", "2021-01-16 17:01:00", 404))
      q.processAllAvailable()
    } finally q.stop()

    // simulate process restart: snapshot file gone, no new traffic yet —
    // building the restarted writer must seed from the state store and
    // publish immediately (the writer is intentionally never started)
    java.nio.file.Files.delete(java.nio.file.Paths.get(out))
    val in2 = MemoryStream[StatEvent]
    snapshotQuery(hostStats(in2.toDS()), out, topN = 500,
      intervalMs = 100L, checkpoint = ckpt)
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out)), "UTF-8")
    assert(json.contains("a.org") && json.contains("b.org"),
      s"restart snapshot incomplete: $json")
  }

  test("rehydration of a fresh (uncommitted) checkpoint is empty, not an error") {
    val empty = java.nio.file.Files.createTempDirectory("rehyd-none").toString
    assert(rehydrateHostStats(spark, empty).collect().isEmpty)
  }
}
