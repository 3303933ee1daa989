package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the r14 verdict watch item: s38@100×'s residual ~85 GB
  * memory-spill lives in the SMJ sorts of the vector-fetch join and the
  * candidate distinct — NOT the (already heap-capped) rerank. In
  * production the chunk indexes are write-once release artifacts, so the
  * release build can choose their physical layout. This probe measures
  * whether writing them BUCKETED by their serving join keys
  * (chunkVecIndex by (corpus_id, chunk_id); chunkBandIndex by
  * (band, key), both sortBy the same and one file per bucket) removes
  * the index-side sort from the serving plan, and what that is worth in
  * wall time and spill at the ladder scale.
  *
  * Both variants run the IDENTICAL serving tail
  * ([[graft.operators.SimilarityOps.chunkBandTopKServe]], spec-pinned
  * equal to the registered s38); only the artifact storage differs:
  *
  *   A. plain parquet files (today's layout),
  *   B. bucketed+sorted tables (`bucketBy`/`sortBy` via saveAsTable).
  *
  * Parity is asserted per run (row count + order-independent xxhash64
  * checksum A == B). Output: one JSON with per-variant runs
  * [sec, spillBytes, shuffleBytes] plus artifact build times/sizes.
  *
  *   runMain graft.tools.BucketServeProbe /tmp/sf1x100 BUCKETSERVE_100x_r15.json
  */
object BucketServeProbe {

  private class Collector extends SparkListener {
    @volatile var shuffleBytes = 0L
    @volatile var spillBytes = 0L
    @volatile var stages = 0
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      synchronized {
        stages += 1
        val m = sc.stageInfo.taskMetrics
        shuffleBytes += m.shuffleWriteMetrics.bytesWritten
        spillBytes += m.diskBytesSpilled + m.memoryBytesSpilled
      }
    def reset(): Unit = synchronized {
      shuffleBytes = 0L; spillBytes = 0L; stages = 0
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BucketServeProbe <sfDir|ladderDir> <outJson>")
    val Array(sfDir, outJson) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nBuckets = cpus.toInt
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
      .config("spark.sql.warehouse.dir", "/tmp/bucket_probe_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.SimilarityOps
    import graft.operators.PipelineQueries.{ChunkTokens, ChunkStride,
      BowDimWide, ChunkBandsWide, ChunkQueryMod, ChunkTopK}

    val collector = new Collector
    spark.sparkContext.addSparkListener(collector)
    def quiesce(): Unit = {
      var last = -1
      while (last != collector.stages) {
        last = collector.stages; Thread.sleep(200)
      }
    }
    def timed(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    def r3(d: Double): String = f"$d%.3f"
    def dirBytes(p: String): Long = {
      val path = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(path)) 0L
      else java.nio.file.Files.walk(path)
        .filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
    }

    val docs = graft.Tables.documents(spark, sfDir)

    // ---- artifact builds (timed once each; write-once per release) --
    val vecIdxDf = SimilarityOps.chunkVecIndex(docs, "doc_id", "text",
      ChunkTokens, ChunkStride, BowDimWide)
    val bandIdxDf = SimilarityOps.chunkBandIndex(docs, "doc_id", "text",
      ChunkTokens, ChunkStride, BowDimWide, ChunkBandsWide)

    val plainVecPath = "/tmp/bucket_probe/vec_idx_plain"
    val plainBandPath = "/tmp/bucket_probe/band_idx_plain"
    val buildPlainSec = timed { () =>
      vecIdxDf.write.mode("overwrite").parquet(plainVecPath)
      bandIdxDf.write.mode("overwrite").parquet(plainBandPath)
    }
    // bucketed: repartition ON the bucket keys first so each bucket is
    // ONE file — multiple files per bucket forfeit the sorted-bucket
    // read and the SMJ sort comes back
    // a fresh derby metastore per JVM forgets last run's tables, so
    // DROP TABLE alone leaves the physical dirs behind and saveAsTable
    // refuses the location — clear the warehouse on disk first
    def rmTree(p: String): Unit = {
      val path = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(path))
        java.nio.file.Files.walk(path)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(java.nio.file.Files.delete(_))
    }
    val buildBucketSec = timed { () =>
      spark.sql("DROP TABLE IF EXISTS probe_vec_idx")
      spark.sql("DROP TABLE IF EXISTS probe_band_idx")
      rmTree("/tmp/bucket_probe_warehouse/probe_vec_idx")
      rmTree("/tmp/bucket_probe_warehouse/probe_band_idx")
      vecIdxDf.repartition(nBuckets, col("corpus_id"), col("chunk_id"))
        .write.mode("overwrite")
        .bucketBy(nBuckets, "corpus_id", "chunk_id")
        .sortBy("corpus_id", "chunk_id")
        .saveAsTable("probe_vec_idx")
      bandIdxDf.repartition(nBuckets, col("band"), col("key"))
        .write.mode("overwrite")
        .bucketBy(nBuckets, "band", "key")
        .sortBy("band", "key")
        .saveAsTable("probe_band_idx")
    }
    val plainBytes = dirBytes(plainVecPath) + dirBytes(plainBandPath)
    val bucketBytes =
      dirBytes("/tmp/bucket_probe_warehouse/probe_vec_idx") +
        dirBytes("/tmp/bucket_probe_warehouse/probe_band_idx")
    println(s"[bucket-serve] build plain=${r3(buildPlainSec)}s " +
      s"(${plainBytes >> 20} MiB) bucketed=${r3(buildBucketSec)}s " +
      s"(${bucketBytes >> 20} MiB)")

    def serve(bandIdx: DataFrame, vecIdx: DataFrame): DataFrame =
      SimilarityOps.chunkBandTopKServe(bandIdx, vecIdx, docs, "doc_id",
        "text", BowDimWide, ChunkBandsWide, ChunkQueryMod, ChunkTopK)

    def checksum(df: DataFrame): (Long, Long) = {
      // bit_xor, not sum: an order-independent fold that cannot
      // overflow (summing full-range xxhash64 longs trips ANSI
      // arithmetic at any real row count)
      val h = df.select(xxhash64(df.columns.map(col): _*).as("h"))
      val r = h.agg(count(lit(1)), expr("bit_xor(h)")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    def runVariant(tag: String, bandIdx: () => DataFrame,
        vecIdx: () => DataFrame, runs: Int): (Seq[String], (Long, Long)) = {
      val metrics = (1 to runs).map { i =>
        quiesce(); collector.reset()
        val sec = timed(() => serve(bandIdx(), vecIdx())
          .write.format("noop").mode("overwrite").save())
        quiesce()
        val (sp, sh) = (collector.spillBytes, collector.shuffleBytes)
        println(s"[bucket-serve] $tag run$i sec=${r3(sec)} " +
          s"spill=${sp >> 20}MiB shuffle=${sh >> 20}MiB")
        s"""{"sec":${r3(sec)},"spill_bytes":$sp,"shuffle_bytes":$sh}"""
      }
      val cs = checksum(serve(bandIdx(), vecIdx()))
      (metrics, cs)
    }

    val (aRuns, aCs) = runVariant("plain",
      () => spark.read.parquet(plainBandPath),
      () => spark.read.parquet(plainVecPath), 3)
    val (bRuns, bCs) = runVariant("bucketed",
      () => spark.table("probe_band_idx"),
      () => spark.table("probe_vec_idx"), 3)
    require(aCs == bCs,
      s"serving parity broke: plain=$aCs bucketed=$bCs")
    println(s"[bucket-serve] parity OK: rows=${aCs._1} checksum=${aCs._2}")

    val json =
      s"""{"src":"$sfDir","n_buckets":$nBuckets,""" +
        s""""build_plain_sec":${r3(buildPlainSec)},""" +
        s""""build_bucketed_sec":${r3(buildBucketSec)},""" +
        s""""plain_bytes":$plainBytes,"bucketed_bytes":$bucketBytes,""" +
        s""""rows":${aCs._1},"checksum":${aCs._2},""" +
        s""""plain_runs":[${aRuns.mkString(",")}],""" +
        s""""bucketed_runs":[${bRuns.mkString(",")}]}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outJson), json + "\n")
    println(s"[bucket-serve] wrote $outJson")
    spark.stop()
  }
}
