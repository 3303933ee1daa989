package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.CrawlSchemas

/** Structured-Streaming source/sink wiring for the crawl-event topics
  * (SURVEY.md §2.1, §2.6). The Kafka connector jar
  * (spark-sql-kafka-0-10) is a deployment-time dependency — not present in
  * this build environment — so these builders only assemble configuration;
  * every transformation downstream is source-agnostic (works identically on
  * MemoryStream / file streams, which is how the test suite drives them).
  */
object CrawlStreams {

  /** Kafka source config (reference report.py:243-268, analysis.py:182-191).
    * Checkpointed offsets replace group-managed commits (ST1/ST2): Spark
    * never relies on Kafka's commit log, strictly stronger than the
    * reference's at-most/at-least-once mix.
    */
  final case class KafkaSource(
      bootstrap: String,
      topic: String,
      startingOffsets: String = "latest", // S1 tail / S2 "earliest"
      maxOffsetsPerTrigger: Option[Long] = None) // S5 admission control

  /** S1/S2: unbounded topic scan. */
  def kafkaStream(spark: SparkSession, src: KafkaSource): DataFrame = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", src.bootstrap)
      .option("subscribe", src.topic)
      .option("startingOffsets", src.startingOffsets)
    src.maxOffsetsPerTrigger.fold(r)(n =>
      r.option("maxOffsetsPerTrigger", n.toString)).load()
  }

  /** S3: bounded time-range replay (reference streamer.py:134-164) — the
    * hand-rolled offsets_for_times/seek/terminate loop collapses into a
    * batch read with timestamp bounds; Kafka's time index does the seek.
    */
  def kafkaBatchTimeRange(spark: SparkSession, src: KafkaSource,
      startMs: Long, endMs: Long): DataFrame =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", src.bootstrap)
      .option("subscribe", src.topic)
      .option("startingTimestamp", startMs.toString)
      .option("endingTimestamp", endMs.toString)
      .load()

  /** P1: raw Kafka frame (key/value binary) → typed crawl events under the
    * union schema, with malformed records routed to a rejects column
    * instead of being dropped silently (reference logs+skips,
    * analysis.py:140-141).
    */
  def parseCrawlEvents(raw: DataFrame): DataFrame =
    raw.select(
        col("key").cast("string").as("kafka_key"),
        col("value").cast("string").as("json"))
      .withColumn("event", from_json(col("json"), CrawlSchemas.crawlEventSchema))
      .withColumn("malformed", col("event").isNull ||
        (col("event.url").isNull && col("event.status_code").isNull))
      .select(col("kafka_key"), col("json"), col("event.*"), col("malformed"))
      // try_: an at-ingest parse must degrade a malformed timestamp to
      // null (the watermark predicate keeps null-ts rows), not crash
      .withColumn("event_ts", try_to_timestamp(col("timestamp")))

  /** S8: keyed JSON producer frame — the murmur3 authority key (P19/ST11)
    * plus a JSON value column, ready for the kafka sink (`kafka.acks=all`
    * configured at the writer, ST9).
    */
  def toKafkaSink(messages: DataFrame, keyCol: String, valueCol: String): DataFrame =
    messages.select(
      col(keyCol).cast("binary").as("key"),
      col(valueCol).cast("binary").as("value"))

  /** Launch-to-outcome correlation: stream-stream join of the launch topic
    * against the crawled-results topic on URL, bounded to outcomes within
    * `horizon` of the launch — the per-URL feedback loop ("did what we
    * launched get crawled, and how fast") the reference can only eyeball
    * across two consoles.
    *
    * State on both sides is watermark+time-range bounded: a launch row is
    * dropped from join state once the result-side watermark passes
    * launch_ts + horizon, and vice versa — bounded regardless of stream
    * volume. `leftOuter` additionally emits launches with NO outcome
    * inside the horizon (null crawl_ts/latency) once their state expires:
    * the crawl-failure detector.
    *
    * `horizon` is the JOIN TIME RANGE (how long after a launch an outcome
    * may still match); `lateness` is the ALLOWED EVENT LATENESS (the
    * watermark delay on both streams), defaulting to `horizon`. They are
    * distinct knobs: with lateness = horizon, a result arriving more than
    * `horizon` behind the result-stream watermark is dropped BEFORE it can
    * match, and in leftOuter mode its launch is then mis-reported as
    * never-crawled — an ingestion-skew deployment raises `lateness`
    * without widening the join window (StreamRestartSpec pins both
    * behaviors).
    *
    * Expects `launches(url, launch_ts)` and `results(crawl_url,
    * crawl_ts)`; emits (url, launch_ts, crawl_ts, latency_s).
    */
  def launchOutcomes(launches: DataFrame, results: DataFrame,
      horizon: String, leftOuter: Boolean = false,
      lateness: Option[String] = None): DataFrame = {
    // lateness < horizon silently reintroduces the conflation this knob
    // exists to fix (an in-horizon straggler dropped pre-join, leftOuter
    // mis-reporting the launch) — reject it up front
    lateness.foreach { lt =>
      require(intervalMicros(lt) >= intervalMicros(horizon),
        s"lateness '$lt' must be >= horizon '$horizon': a smaller " +
          "watermark delay drops in-horizon stragglers before they can match")
    }
    val wm = lateness.getOrElse(horizon)
    val l = launches.withWatermark("launch_ts", wm)
    val r = results.withWatermark("crawl_ts", wm)
    l.join(r,
        col("crawl_url") === col("url") &&
          col("crawl_ts") >= col("launch_ts") &&
          col("crawl_ts") <= col("launch_ts") + expr(s"INTERVAL $horizon"),
        if (leftOuter) "leftOuter" else "inner")
      .select(col("url"), col("launch_ts"), col("crawl_ts"),
        (col("crawl_ts").cast("long") - col("launch_ts").cast("long"))
          .as("latency_s"))
  }

  /** Fixed-duration interval string ("10 minutes", "2 hours") → total
    * microseconds, for the lateness >= horizon validation. Month-bearing
    * intervals are rejected: they have no fixed duration to compare.
    */
  private def intervalMicros(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0,
      s"interval '$s' has a month component — no fixed duration to compare")
    iv.days * 86400000000L + iv.microseconds
  }
}
