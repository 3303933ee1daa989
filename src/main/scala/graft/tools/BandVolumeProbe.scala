package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: the per-query CANDIDATE VOLUME of the banded retrieval
  * geometries, measured WITHOUT materializing the candidate join — the
  * number the r13 100× run could only demonstrate by dying (the 4×4-bit
  * geometry was killed after 15 min once ~25% of a 5M-chunk corpus
  * became a candidate per query).
  *
  * Pre-dedup candidate rows = Σ over (band, key) of
  * n_chunks(band, key) × n_queries(band, key): two small key-histogram
  * aggregates and one join of histograms — O(distinct keys), exact,
  * and computable at ANY corpus scale including the one where the join
  * itself is the thing that doesn't fit. (Self-pairs query==corpus doc
  * are included — one chunk-side doc per query, negligible and stated.)
  *
  *   runMain graft.tools.BandVolumeProbe /tmp/sf1x100 [outJson]
  *
  * Reports both executed geometries (s35's 16-bit sig / 4×4-bit bands,
  * s38's 32-bit sig / 2×16-bit bands) with per-query means — the
  * "candidate volume collapses" claim measured, not asserted.
  */
object BandVolumeProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BandVolumeProbe <sfDir> [outJson]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.SimilarityOps
    import graft.operators.PipelineQueries.{ChunkTokens, ChunkStride, ChunkQueryMod}

    val docs = graft.Tables.documents(spark, sfDir)

    def probe(dim: Int, bands: Int): (Long, Long, Long, Double) = {
      val b = dim / bands
      val cHist = SimilarityOps.chunkBandIndex(docs, "doc_id", "text",
          ChunkTokens, ChunkStride, dim, bands)
        .groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("nc"))
      val qSig = docs
        .filter(pmod(col("doc_id"), lit(ChunkQueryMod.toLong)) === 0)
        .select(col("doc_id"),
          SimilarityOps.docSig(col("text"), dim).as("sig"))
      val qHist = qSig
        .select(explode_outer(array((0 until bands).map(i =>
          struct(lit(i).as("band"),
            SimilarityOps.bandKey(col("sig"), i, b).as("key"))): _*))
          .as("bk"))
        .filter(col("bk").isNotNull)
        .groupBy(col("bk.band").as("band"), col("bk.key").as("key"))
        .agg(count(lit(1)).as("nq"))
      val row = cHist.join(qHist, Seq("band", "key"))
        .agg(sum(col("nc") * col("nq")).as("cand")).head()
      val cand = if (row.isNullAt(0)) 0L else row.getLong(0)
      val nQueries = qSig.count()
      val nChunks = SimilarityOps.chunkBandIndex(docs, "doc_id", "text",
        ChunkTokens, ChunkStride, dim, bands).count() / bands
      (cand, nQueries, nChunks,
        if (nQueries == 0) 0.0 else cand.toDouble / nQueries)
    }

    val out = Seq((16, 4, "s35"), (32, 2, "s38")).map { case (dim, bands, tag) =>
      val (cand, nq, nc, perQ) = probe(dim, bands)
      println(f"[band-volume] $tag dim=$dim bands=$bands: " +
        f"queries=$nq chunks=$nc pre-dedup candidate rows=$cand " +
        f"(${perQ}%.1f per query, ${if (nc == 0) 0.0 else 100.0 * perQ / nc}%.3f%% of corpus chunks)")
      s""""$tag":{"dim":$dim,"bands":$bands,"n_queries":$nq,""" +
        s""""n_chunks":$nc,"cand_rows":$cand,"per_query":$perQ}"""
    }

    // The bitext geometries, same histogram trick over the two embedding
    // halves: pre-dedup candidate rows = Σ n_left(band,key)·n_right(band,key).
    // Reports the registered dial (16-bit sig, 2×8-bit bands) and the
    // widened one (32-bit sig, 2×16-bit bands — the s38 move applied to
    // s40 when the corpus outgrows 8-bit collision mass).
    val emb = graft.Tables.embeddings(spark, sfDir)
    val lSide = emb.filter(pmod(col("vec_id"), lit(2L)) === 0L)
    val rSide = emb.filter(pmod(col("vec_id"), lit(2L)) === 1L)
    // side counts are dial-invariant — counted once, not per geometry
    val nl = lSide.count()
    val nr = rSide.count()
    def bitextProbe(sigDim: Int, bands: Int): (Long, Double) = {
      def hist(side: DataFrame): DataFrame =
        SimilarityOps.bitextBandIndex(side, sigDim, bands)
          .groupBy(col("band"), col("key")).agg(count(lit(1)).as("n"))
      val rh = hist(rSide).withColumnRenamed("n", "nr")
      val row = hist(lSide).join(rh, Seq("band", "key"))
        .agg(sum(col("n") * col("nr")).as("cand")).head()
      val cand = if (row.isNullAt(0)) 0L else row.getLong(0)
      (cand, if (nl * nr == 0) 0.0 else 100.0 * cand / (nl.toDouble * nr))
    }
    val outB = Seq((16, 2, "s40"), (32, 2, "s42_wide")).map {
      case (sigDim, bands, tag) =>
        val (cand, pct) = bitextProbe(sigDim, bands)
        println(f"[band-volume] $tag sigDim=$sigDim bands=$bands: " +
          f"left=$nl right=$nr pre-dedup candidate rows=$cand " +
          f"($pct%.4f%% of LxR)")
        s""""$tag":{"sig_dim":$sigDim,"bands":$bands,"n_left":$nl,""" +
          s""""n_right":$nr,"cand_rows":$cand,"pct_of_cross":$pct}"""
    }
    val json = s"""{"sf_dir":"$sfDir",${(out ++ outB).mkString(",")}}"""
    if (args.length > 1)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)), json + "\n")
    println(json)
    spark.stop()
  }
}
