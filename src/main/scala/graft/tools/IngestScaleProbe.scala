package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The at-ingest path through the 100× gate (r14 Next #5): every
  * streaming leg is batch-identity pinned at fixture scale, but the
  * scale gates only ever ran the BATCH rungs. This probe drives the two
  * wide-dial serving probes — `chunkRetrieveTopKBanded` (s38's at-ingest
  * twin) and `bitextMineProbe` (s43's) — against artifacts built from a
  * ladder slice, with a bounded arrival stream, and records
  * per-microbatch latency (p50/p95 of triggerExecution) plus the
  * artifact build cost and parquet footprint.
  *
  * The artifacts are written to and read back from parquet, as a
  * release would serve them — the stream-static joins see a file scan,
  * not an in-memory fixture.
  *
  *   runMain graft.tools.IngestScaleProbe /tmp/sf1x100 INGEST_100x_r15.json
  */
object IngestScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: IngestScaleProbe <sfDir|ladderDir> <outJson>")
    val Array(sfDir, outJson) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // this tool drives ONLY capped-heap paths (the serving tails and
      // their artifact builders), so the HeapScope raise is safe
      // session-wide here: buffers hold <= k entries per group, the
      // object hash map is bounded by groups/partition x k (measured:
      // s38@100x 22.8 GB spill -> 0 with this raised)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "131072")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.SimilarityOps
    import graft.operators.PipelineQueries.{ChunkTokens, ChunkStride,
      BowDimWide, ChunkBandsWide, ChunkTopK}

    def timed(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    def r3(d: Double): String = f"$d%.3f"
    def sized(name: String, df: DataFrame): (String, Double, Long) = {
      val out = s"/tmp/ingest_probe/$name"
      val sec = timed(() => df.write.mode("overwrite").parquet(out))
      val bytes = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
        .filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      println(f"[ingest-probe] $name built ${r3(sec)}s, ${bytes >> 20} MiB")
      (out, sec, bytes)
    }
    def ts(i: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2021-01-16 ${17 + i / 60}%02d:${i % 60}%02d:00")

    /** Feed `batches` microbatches through `mkQuery`, one
      * processAllAvailable per batch, and report per-batch
      * triggerExecution p50/p95 (the final flush arrival excluded). */
    def drive[A](tag: String, batches: Seq[Seq[A]], flush: A,
        add: (MemoryStream[A], Seq[A]) => Unit,
        mk: MemoryStream[A] => DataFrame)(
        implicit ev: org.apache.spark.sql.Encoder[A]): String = {
      val in = MemoryStream[A]
      val q = mk(in).writeStream.format("memory")
        .queryName(s"ingest_$tag").outputMode("append").start()
      val perBatch = try {
        val secs = batches.map { b =>
          add(in, b); timed(() => q.processAllAvailable())
        }
        add(in, Seq(flush)); q.processAllAvailable()
        secs
      } finally q.stop()
      val sorted = perBatch.sorted
      def pct(p: Double): Double =
        sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))
      val outRows = spark.table(s"ingest_$tag").count()
      println(s"[ingest-probe] $tag batches=${perBatch.length} " +
        s"p50=${r3(pct(0.50))}s p95=${r3(pct(0.95))}s " +
        s"max=${r3(sorted.last)}s outRows=$outRows")
      s""""$tag":{"batches":${perBatch.length},""" +
        s""""batch_size":${batches.head.length},""" +
        s""""p50_sec":${r3(pct(0.50))},"p95_sec":${r3(pct(0.95))},""" +
        s""""max_sec":${r3(sorted.last)},"out_rows":$outRows,""" +
        s""""per_batch_sec":[${perBatch.map(r3).mkString(",")}]}"""
    }

    // ---- 1. chunk retrieval at the wide dial over ladder docs -------
    val docs = graft.Tables.documents(spark, sfDir)
    val (bandPath, bandSec, bandBytes) = sized("chunk_band_idx",
      SimilarityOps.chunkBandIndex(docs, "doc_id", "text",
        ChunkTokens, ChunkStride, BowDimWide, ChunkBandsWide))
    val (vecPath, vecSec, vecBytes) = sized("chunk_vec_idx",
      SimilarityOps.chunkVecIndex(docs, "doc_id", "text",
        ChunkTokens, ChunkStride, BowDimWide))
    val bandIdx = spark.read.parquet(bandPath)
    val vecIdx = spark.read.parquet(vecPath)
    // arrivals: 240 real ladder docs, re-keyed so self-exclusion never
    // hides a hit
    val arrivalDocs = docs.filter(pmod(col("doc_id"), lit(401L)) === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
      .limit(240).collect().map(r => (r.getLong(0), r.getString(1)))
    val chunkBatches = arrivalDocs.grouped(12).toSeq.zipWithIndex.map {
      case (g, i) => g.toSeq.map { case (id, t) => (ts(i), id, t) }
    }
    val chunkJson = drive[(java.sql.Timestamp, Long, String)]("chunk_retrieve_wide",
      chunkBatches, (ts(119), -1L, "flush"),
      (s, b) => { s.addData(b); () },
      in => graft.streaming.PipelineStreams.chunkRetrieveTopKBanded(
        in.toDF().toDF("ts", "doc_id", "text"), bandIdx, vecIdx, "ts",
        "doc_id", "text", BowDimWide, ChunkBandsWide, ChunkTopK,
        "10 minutes", "5 minutes"))

    // ---- 2. bitext forward mining at the wide dial ------------------
    val emb = graft.Tables.embeddings(spark, sfDir)
    val left = emb.filter(abs(col("vec_id") % 2) === 0L)
    val right = emb.filter(abs(col("vec_id") % 2) === 1L)
    val (bBandPath, bBandSec, bBandBytes) = sized("bitext_band_idx",
      SimilarityOps.bitextBandIndex(right, 32, 2))
    val (bVecPath, bVecSec, bVecBytes) = sized("bitext_vec_idx",
      SimilarityOps.bitextVecIndex(right))
    val (bNbrPath, bNbrSec, bNbrBytes) = sized("bitext_nbr_idx",
      SimilarityOps.bitextNeighborhoodIndex(left, right, 4, 32, 2))
    val bBandIdx = spark.read.parquet(bBandPath)
    val bVecIdx = spark.read.parquet(bVecPath)
    val bNbrIdx = spark.read.parquet(bNbrPath)
    val arrivalVecs = left.filter(pmod(col("vec_id"), lit(401L)) === 0)
      .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding"))
      .limit(240).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val bitextBatches = arrivalVecs.grouped(12).toSeq.zipWithIndex.map {
      case (g, i) => g.toSeq.map { case (id, v) => (ts(i), id, v) }
    }
    val bitextJson = drive[(java.sql.Timestamp, Long, Seq[Float])]("bitext_mine_wide",
      bitextBatches, (ts(119), -1L, arrivalVecs.head._2),
      (s, b) => { s.addData(b); () },
      in => graft.streaming.PipelineStreams.bitextMineProbe(
        in.toDF().toDF("ts", "vec_id", "embedding"), bBandIdx, bVecIdx,
        bNbrIdx, "ts", "vec_id", "embedding", sigDim = 32, bands = 2,
        k = 4, "10 minutes", "5 minutes"))

    val json =
      s"""{"src":"$sfDir","artifacts":{""" +
        s""""chunk_band_idx":{"build_sec":${r3(bandSec)},"bytes":$bandBytes},""" +
        s""""chunk_vec_idx":{"build_sec":${r3(vecSec)},"bytes":$vecBytes},""" +
        s""""bitext_band_idx":{"build_sec":${r3(bBandSec)},"bytes":$bBandBytes},""" +
        s""""bitext_vec_idx":{"build_sec":${r3(bVecSec)},"bytes":$bVecBytes},""" +
        s""""bitext_nbr_idx":{"build_sec":${r3(bNbrSec)},"bytes":$bNbrBytes}},""" +
        s"""$chunkJson,$bitextJson}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outJson), json + "\n")
    println(s"[ingest-probe] wrote $outJson")
    spark.stop()
  }
}
