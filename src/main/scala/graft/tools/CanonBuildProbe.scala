package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the ONE-SHOT canonical-corpus build (s44's first stage) on a
  * ladder slice BEFORE anyone gates it at 100× — the
  * MediaBandProbe/ChunkDialProbe discipline. The d10 machinery's cost
  * driver at a dup-dense corpus is the band-candidate pair mass times
  * the two shingle-array attach joins of the exact-Jaccard verify: at
  * C(replicas, 2) pairs per original document the verify moves
  * pair_count × ~2 shingle arrays, which goes quadratic in duplicate
  * density. This probe counts the candidate pairs and the per-side
  * array bytes so the decision (gate at which scale; serve the build
  * incrementally in production) is measured, not guessed.
  *
  *   runMain graft.tools.CanonBuildProbe /tmp/sf1x10 /tmp/sf1x100 CANONBUILD_r17.json
  */
object CanonBuildProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CanonBuildProbe <ladderDir>... <outJson>")
    val dirs = args.dropRight(1)
    val outJson = args.last
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
    import graft.functions.TextFns

    val out = dirs.map { d =>
      val docs = graft.Tables.documents(spark, d)
      val n = docs.count()
      val cands = DedupOps.minhashCandidates(docs, "doc_id", "text")
      val nc = cands.count()
      val shStats = docs.select(
          size(TextFns.wordShingles(col("text"), 3)).as("ns"))
        .agg(sum(col("ns")).as("tot"), avg(col("ns")).as("mean")).head()
      val meanSh = shStats.getDouble(1)
      // ~20 bytes per 3-word shingle string; the verify attaches TWO
      // arrays per candidate pair
      val verifyGb = nc * 2 * meanSh * 20 / 1e9
      println(f"[canon-build] $d docs=$n cand_pairs=$nc " +
        f"mean_shingles=$meanSh%.0f est_verify_attach=${verifyGb}%.1f GB")
      s""""$d":{"docs":$n,"cand_pairs":$nc,""" +
        f""""mean_shingles":$meanSh%.1f,"est_verify_attach_gb":$verifyGb%.1f}"""
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson),
      "{" + out.mkString(",") + "}\n")
    println(s"[canon-build] wrote $outJson")
    spark.stop()
  }
}
