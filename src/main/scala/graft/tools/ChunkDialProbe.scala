package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the next-wider chunk-retrieval band geometry on per-arrival
  * candidate mass at 100× artifacts (r16 VERDICT #4) — the
  * BandVolumeProbe/MediaBandProbe discipline: MEASURE whether candidate
  * volume is what the 53 ms/arrival marginal cost buys before
  * registering a wider dial. For each geometry, builds the banded index
  * over the ladder docs, replays the ingest probe's arrival sample
  * (same 1/401 selection, re-keyed), and reports the per-arrival
  * candidate-row and distinct-candidate counts the streaming probe's
  * band equi-join would produce.
  *
  *   runMain graft.tools.ChunkDialProbe /tmp/sf1x100 CHUNKDIAL_100x_r17.json
  */
object ChunkDialProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ChunkDialProbe <ladderDir> <outJson>")
    val Array(sfDir, outJson) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.SimilarityOps
    import graft.functions.TextFns
    import graft.operators.PipelineQueries.{ChunkTokens, ChunkStride}

    val docs = graft.Tables.documents(spark, sfDir)
    val arrivals = docs.filter(pmod(col("doc_id"), lit(401L)) === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
      .limit(240)
    arrivals.persist(); val nArr = arrivals.count()

    def priceDial(dim: Int, bands: Int): String = {
      val b = dim / bands
      val idx = SimilarityOps.chunkBandIndex(docs, "doc_id", "text",
        ChunkTokens, ChunkStride, dim, bands)
      idx.persist()
      val idxRows = idx.count()
      // the streaming probe's query-side banding, replayed batch-side
      val qBands = arrivals
        .select(col("doc_id"),
          TextFns.hashedBow(col("text"), dim).cast("array<double>").as("qv"))
        .withColumn("sig", SimilarityOps.sigOf(col("qv"), dim))
        .select(col("doc_id"),
          explode(array((0 until bands).map(i =>
            struct(lit(i).as("band"),
              shiftright(col("sig"), i * b)
                .bitwiseAND(lit((1L << b) - 1)).as("key"))): _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"),
          col("bk.key").as("key"))
      val cand = qBands.join(idx, Seq("band", "key"))
        .filter(col("corpus_id") =!= col("doc_id"))
      val perArr = cand.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("rows"),
          count_distinct(col("corpus_id"), col("chunk_id")).as("cands"))
        .agg(sum(col("rows")).as("rows"), sum(col("cands")).as("cands"),
          max(col("cands")).as("max_cands"))
        .head()
      idx.unpersist()
      val (rows, cands, mx) =
        (perArr.getLong(0), perArr.getLong(1), perArr.getLong(2))
      println(s"[chunk-dial] dim=$dim bands=$bands (${b}-bit): " +
        s"idx_rows=$idxRows cand_rows=$rows distinct_cands=$cands " +
        s"mean/arrival=${cands / math.max(1L, nArr)} max/arrival=$mx")
      s""""dim${dim}x$bands":{"bits_per_band":$b,"index_rows":$idxRows,""" +
        s""""cand_rows":$rows,"distinct_cands":$cands,""" +
        s""""mean_per_arrival":${cands / math.max(1L, nArr)},""" +
        s""""max_per_arrival":$mx}"""
    }

    val out = Seq(priceDial(32, 2), priceDial(48, 2), priceDial(48, 3))
    val json = s"""{"src":"$sfDir","arrivals":$nArr,""" +
      out.mkString(",") + "}"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outJson), json + "\n")
    println(s"[chunk-dial] wrote $outJson")
    spark.stop()
  }
}
