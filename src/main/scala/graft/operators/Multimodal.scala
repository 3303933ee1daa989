package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns travelling next to typed metadata, with decode /
  * feature-extraction as partition-local transforms.
  *
  * The decode step itself is STUBBED (this environment has no image/audio
  * codecs — builder brief): [[fakeDecode]] derives deterministic metadata
  * from the leading payload bytes, standing in for a real libjpeg/ffmpeg
  * call. Everything around it — schema, batch shape, partition-local
  * execution, column pruning of the heavy binary — is real and tested.
  *
  * Scale design: the binary column never shuffles. Metadata extraction is a
  * map (`mapPartitions`, one codec init per partition, mirroring a Pandas
  * UDF's per-batch shape); downstream joins/filters operate on the small
  * metadata frame and re-join by id only when payload access is needed.
  */
object Multimodal {

  /** One media row: payload + envelope. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted metadata (what a real decoder would yield). */
  case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, ok: Boolean)

  /** Deterministic stand-in for the codec call: header-derived pseudo
    * dimensions. Replace with the real decoder where codecs exist.
    */
  def fakeDecode(row: MediaRow): MediaMeta = {
    val b = row.payload
    val ok = b != null && b.length > 0
    val h0 = if (ok) (b(0) & 0xff) else 0
    val h1 = if (ok && b.length > 1) (b(1) & 0xff) else 0
    MediaMeta(row.media_id, row.kind, if (b == null) 0L else b.length.toLong,
      width = 64 + (h0 % 64) * 16, height = 64 + (h1 % 64) * 16,
      n_frames = if (row.kind == "video") 1 + h0 % 30 else 1, ok = ok)
  }

  /** Partition-local decode: one initialization per partition (the shape a
    * real codec needs), rows streamed through — the Scala analogue of
    * `mapInPandas` batch processing.
    */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: initialize codec context here, once per partition
      rows.map(fakeDecode)
    }
  }

  /** Synthesize a media table from the documents table (deterministic:
    * payload = utf-8 bytes of text) — the test/bench substrate given no
    * real binaries ship with the testdata.
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "utf-8").as("payload"))
      .as[MediaRow]
  }

  /** Frame sampling for video rows: one output row per sampled frame index
    * (every `stride`-th frame) — generator-shaped, so `explode` over a
    * per-row `sequence`, no UDTF needed.
    */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1,
          lit(stride))).as("frame_idx"))

  /** Resize plan: fit (width, height) into a `target`×`target` box
    * preserving aspect ratio, plus letterbox padding — the metadata half of
    * an image-resize stage (the pixel op itself belongs in the stubbed
    * decoder). All-integer arithmetic (scale via `w*target DIV max(w,h)`)
    * so the plan is engine-portable with no float-rounding hazards, and a
    * pure projection — no shuffle, runs inside the scan's codegen stage.
    */
  def resizePlan(meta: DataFrame, target: Int): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    // floor() on exact small doubles == integer DIV on both engines; avoid
    // bare double→int casts (Spark truncates, DuckDB rounds)
    val outW = floor(col("width") * target / longest).cast("int")
    val outH = floor(col("height") * target / longest).cast("int")
    meta.select(col("media_id"), col("width"), col("height"),
      outW.as("out_w"), outH.as("out_h"),
      floor((lit(target) - outW) / 2).cast("int").as("pad_x"),
      floor((lit(target) - outH) / 2).cast("int").as("pad_y"))
  }
}
