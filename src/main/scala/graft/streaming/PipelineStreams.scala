package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming counterparts of the training-data pipeline operators: the
  * at-ingest variants of dedup and quality gating, so a corpus can be
  * cleaned as it arrives instead of in a batch pass afterwards.
  *
  * Scale shape: both operators key their state on the content digest
  * ([[graft.operators.DedupOps.contentDigest]] — the 32-char hex md5, the
  * SAME definition as the batch d01 pass), never the text, so state size
  * is bounded by distinct-digest cardinality inside the watermark window —
  * the same only-signatures-move discipline as the batch DedupOps.
  */
object PipelineStreams {

  /** At-ingest exact dedup: ONE copy per content digest survives, later
    * copies are dropped. Within a micro-batch the surviving row is
    * partition-order-arbitrary (dropDuplicatesWithinWatermark semantics),
    * NOT the earliest timestamp — callers needing a deterministic
    * canonical row run the batch d01 pass (min-id) downstream. State is
    * bounded by the event-time watermark: two copies within `delay` of
    * each other dedup exactly; copies farther apart may re-emit — the
    * standard bounded-state trade (unbounded exact dedup at 100 TB means
    * unbounded state), with the batch pass as the backstop for late
    * re-crawls.
    *
    * Output contract: the input schema plus a `digest` column (replacing
    * any pre-existing column of that name).
    */
  def dedupByDigest(docs: DataFrame, tsCol: String, textCol: String,
      delay: String): DataFrame =
    docs
      .withColumn("digest", graft.operators.DedupOps.contentDigest(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("digest")

  /** At-ingest quality gate: the t02 keep-flag applied as a streaming
    * filter (stateless — composes with [[dedupByDigest]] upstream of any
    * stateful stage).
    */
  def qualityGate(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(
      graft.functions.TextFns.qualityFeatures(col(textCol)).getField("keep"))
}
