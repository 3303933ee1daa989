package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: row counts (and parquet-serialized bytes) of the
  * pre-materialized retrieval/decontamination artifacts at a given sf
  * or ladder dir — the numbers that decide what is broadcast-safe at
  * scale (the t47 bench window index must stay bounded by the BENCH
  * side's size, never the corpus's; the band index rows scale as
  * bands × chunks).
  *
  *   runMain graft.tools.ArtifactProbe /tmp/sf1x100
  */
object ArtifactProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ArtifactProbe <sfDir>")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{DedupOps, SimilarityOps}
    import graft.operators.PipelineQueries.{ChunkTokens, ChunkStride}

    val docs = graft.Tables.documents(spark, sfDir)
    def sized(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val out = s"/tmp/artifact_probe/$name"
      df.write.mode("overwrite").parquet(out)
      val bytes = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
        .filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      val rows = spark.read.parquet(out).count()
      println(f"[artifact] $name: $rows%,d rows, ${bytes / 1024.0 / 1024.0}%.1f MiB parquet")
    }
    // t47's decontamination probe side: every distinct 8-token window
    // hash of the doc_id % 50 == 0 bench slice (t47's geometry)
    val bench = docs.filter(pmod(col("doc_id"), lit(50L)) === 0)
    sized("window_hash_index_bench",
      DedupOps.windowHashIndex(bench, "doc_id", "text", 8))
    // the full-corpus window index (the d33-at-ingest probe side)
    sized("window_hash_index_corpus",
      DedupOps.windowHashIndex(docs, "doc_id", "text", 8))
    // the two executed band-index geometries
    sized("chunk_band_index_s35",
      SimilarityOps.chunkBandIndex(docs, "doc_id", "text",
        ChunkTokens, ChunkStride, 16, 4))
    sized("chunk_band_index_s38",
      SimilarityOps.chunkBandIndex(docs, "doc_id", "text",
        ChunkTokens, ChunkStride, 32, 2))
    spark.stop()
  }
}
