package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The incremental-ingest dedup family's CORPUS axis, isolated (r15
  * VERDICT #2): the ScaleGate rows run the registry forms, where batch
  * AND corpus grow together with the ladder factor; the production
  * steady state is the other shape — a FIXED daily batch classified
  * against an ACCUMULATED corpus that has grown 10×/100× past it. This
  * probe holds the batch constant (the source sf dir's `doc_id % 10
  * == 0` slice, re-keyed above every ladder id; half kept verbatim so
  * exact-dup hits exist in ladder copy 0, half perturbed with a novel
  * suffix token so the near-dup legs do real verify work) and swings
  * ONLY the corpus.
  *
  * Two rows per operator per corpus:
  *   - `rederive`: the registry form — corpus text scanned and digested
  *     per run. This is corpus-sized BY CONSTRUCTION (the scan is the
  *     cost); the claim to verify is that nothing downstream of the
  *     scan moves corpus-sized data (the probe joins stay batch-sized,
  *     so wall grows ~linearly with ONE corpus scan, never worse).
  *   - `served` (d17/d24 only): the production shape — the corpus
  *     digest artifact (the d01 output) pre-materialized to parquet
  *     once per corpus release, classification probing the artifact.
  *     With the bloom (d24) the artifact scan is pruned before its
  *     exchange, so per-batch cost should be near-flat in corpus scale.
  *
  *   runMain graft.tools.IngestDedupScaleProbe /root/testdata/sf0.1 \
  *     INGESTDEDUP_r16.json 1=/root/testdata/sf0.1,10=/tmp/sf1x10,100=/tmp/sf1x100
  */
object IngestDedupScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: IngestDedupScaleProbe <batchSrcSfDir> <outJson> <label=corpusDir,...>")
    val Array(batchSrc, outJson, corporaS) = args.take(3)
    val corpora = corporaS.split(",").map { kv =>
      val Array(l, d) = kv.split("=", 2); (l, d)
    }.toSeq

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.DedupOps

    def timed(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    def r3(d: Double): String = f"$d%.3f"
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def bestOf(n: Int)(f: () => Unit): (Double, Seq[Double]) = {
      val runs = Seq.fill(n)(timed(f)); (runs.min, runs)
    }

    // the FIXED batch: ~10% of the 1× corpus, re-keyed far above every
    // ladder id; even-halved into verbatim (exact dups of ladder
    // copy 0) and suffix-perturbed (novel, near-dup of their original)
    val batch = graft.Tables.documents(spark, batchSrc)
      .filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        when(col("doc_id") % 20 === 0,
          concat(col("text"), lit(" zqnovel")))
          .otherwise(col("text")).as("text"))
    val batchRows = batch.count()
    println(s"[ingestdedup-probe] fixed batch rows=$batchRows from $batchSrc")

    val rows = corpora.flatMap { case (label, dir) =>
      val corpus = graft.Tables.documents(spark, dir)
      val corpusRows = corpus.count()
      println(s"[ingestdedup-probe] corpus $label ($dir) rows=$corpusRows")

      def row(op: String, mode: String, best: Double,
          runs: Seq[Double]): String = {
        println(s"[ingestdedup-probe] $label $op/$mode best=${r3(best)} " +
          s"runs=${runs.map(r3).mkString(",")}")
        s""""${op}_$mode":{"best":${r3(best)},""" +
          s""""runs":[${runs.map(r3).mkString(",")}]}"""
      }

      val (d17b, d17r) = bestOf(2)(() => noop(
        DedupOps.incrementalDedup(corpus, batch, "doc_id", "text")))
      val (d18b, d18r) = bestOf(2)(() => noop(
        DedupOps.incrementalNearDup(corpus, batch, "doc_id", "text", 0.9)))
      val (d20b, d20r) = bestOf(2)(() => noop(
        DedupOps.ingestTriage(corpus, batch, "doc_id", "text", 0.9)))
      val (d24b, d24r) = bestOf(2)(() => noop(
        DedupOps.bloomIncrementalDedup(corpus, batch, "doc_id", "text",
          expectedBatchDocs = math.max(batchRows, 1000L))))

      // the artifact-served shape: digest index built ONCE per corpus
      // release (timed + sized), classification probing the parquet
      val artPath = s"/tmp/ingestdedup_probe/digests_$label"
      val artSec = timed(() =>
        corpus.select(DedupOps.contentDigest(col("text")).as("digest"))
          .distinct()
          .write.mode("overwrite").parquet(artPath))
      val artBytes = java.nio.file.Files.walk(
        java.nio.file.Paths.get(artPath))
        .filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      println(s"[ingestdedup-probe] $label digest artifact " +
        s"${r3(artSec)}s ${artBytes >> 20} MiB")
      val artifact = spark.read.parquet(artPath)
      val (d17sb, d17sr) = bestOf(3)(() => noop(
        DedupOps.incrementalDedupFromDigests(artifact, batch,
          "doc_id", "text")))
      val (d24sb, d24sr) = bestOf(3)(() => noop(
        DedupOps.incrementalDedupFromDigests(artifact, batch,
          "doc_id", "text", Some(math.max(batchRows, 1000L)))))

      Seq(s""""$label":{"dir":"$dir","corpus_rows":$corpusRows,""" +
        s""""digest_artifact":{"build_sec":${r3(artSec)},"bytes":$artBytes},""" +
        Seq(row("d17", "rederive", d17b, d17r),
          row("d18", "rederive", d18b, d18r),
          row("d20", "rederive", d20b, d20r),
          row("d24", "rederive", d24b, d24r),
          row("d17", "served", d17sb, d17sr),
          row("d24", "served", d24sb, d24sr)).mkString(",") + "}")
    }

    val json = s"""{"batch_src":"$batchSrc","batch_rows":$batchRows,""" +
      s""""corpora":{${rows.mkString(",")}}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outJson), json + "\n")
    println(s"[ingestdedup-probe] wrote $outJson")
    spark.stop()
  }
}
