package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: the CANDIDATE PAIR MASS of the m-family banded prints —
  * the [[BandVolumeProbe]] discipline applied to m09/m11/m12 before
  * touching their dials (r16 VERDICT #1: the m-family saturates at 100×
  * on 371–571 s band joins; measure whether candidate mass is the cost
  * and WHERE it comes from before widening anything).
  *
  * Pre-verify candidate pairs = Σ over band buckets of C(n, 2),
  * computed from bucket histograms only — no candidate join is
  * materialized, so the probe is O(distinct keys) at any scale.
  * Reported per modality, on TWO candidate generators:
  *
  *   - `raw`: buckets over every hashed row (the shipped m09/m11 join);
  *   - `uniq`: buckets over DISTINCT prints — the mass the same join
  *     generates after collapsing print-identical rows to one
  *     representative (exact-dup groups are cliques by construction;
  *     connectivity only needs their representative in the band join).
  *
  * raw >> uniq ⇒ the wall is print-identical duplicate groups and the
  * exact, answer-preserving fix is the distinct-print collapse; raw ≈
  * uniq ⇒ the mass is near-collisions between DISTINCT prints and only
  * a wider/looser dial (fewer bands, more bits) can cut it.
  *
  * The print-group size histogram pins the same story from the other
  * side (a few giant identical-print groups ⇒ C(group, 2) dominates).
  *
  *   runMain graft.tools.MediaBandProbe /tmp/sf1x100 MEDIABAND_100x.json
  */
object MediaBandProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MediaBandProbe <sfDir> [outJson]")
    val sfDir = args(0)
    val outJson = if (args.length > 1) Some(args(1)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.operators.Multimodal

    def r1(d: Double): String = f"$d%.1f"

    /** Σ C(n,2) over the given bucket key of `df`, plus the hottest
      * bucket's size. */
    def pairMass(df: DataFrame, keys: Seq[String]): (Long, Long) = {
      val h = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) / 2")).cast("long").as("pairs"),
          max(col("n")).as("hot"))
        .head()
      (h.getLong(0), h.getLong(1))
    }

    /** Identical-print group stats over `df` grouped by `printCols`. */
    def groupStats(df: DataFrame, printCols: Seq[String]): String = {
      val sizes = df.groupBy(printCols.map(col): _*)
        .agg(count(lit(1)).as("n"))
      val top = sizes.orderBy(col("n").desc).limit(5)
        .select(col("n")).as[Long].collect()
      val agg = sizes.agg(count(lit(1)).as("groups"),
        sum(expr("n * (n - 1) / 2")).cast("long").as("clique_pairs"))
        .head()
      s""""groups":${agg.getLong(0)},"clique_pairs":${agg.getLong(1)},""" +
        s""""top_group_sizes":[${top.mkString(",")}]"""
    }

    // The m09/m11/m12 registry corpus recipe: ladder media + identical
    // payloads re-keyed at +10M (every original/copy pair an exact dup).
    val base = Multimodal.mediaFromDocuments(spark, sfDir)
    val media = base.union(
      base.map(r => r.copy(media_id = r.media_id + 10000000L)))

    // ---------------- m09: visual (4×16-bit aHash bands) --------------
    val hashes = Multimodal.imageHash(media).toDF().localCheckpoint()
    val n = hashes.count()
    val uniqPrints = hashes.select(col("ha"), col("hb")).distinct()
      .localCheckpoint()
    val u = uniqPrints.count()
    val (rawPairs, rawHot) =
      pairMass(Multimodal.imageHashBands(hashes), Seq("band", "band_key"))
    val (uniqPairs, uniqHot) = pairMass(
      Multimodal.imageHashBands(
        uniqPrints.withColumn("media_id", lit(0L))),
      Seq("band", "band_key"))
    val vGroups = groupStats(hashes, Seq("ha", "hb"))
    println(s"[media-band] m09 visual: rows=$n uniq_prints=$u " +
      s"raw_pairs=$rawPairs (hot=$rawHot) uniq_pairs=$uniqPairs " +
      s"(hot=$uniqHot) ratio=${r1(rawPairs.toDouble / math.max(1L, uniqPairs))}")
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = true))

    // ---------------- m11/m12: audio (fair-split delta-sign bands) ----
    val bits = Multimodal.audioFullBits(media, windowFrames = 5).toDF()
      .filter(col("n_bits") >= 8).localCheckpoint()
    val an = bits.count()
    val aUniq = bits.select(col("n_windows"), col("n_bits"), col("fa"),
      col("fb")).distinct().localCheckpoint()
    val au = aUniq.count()
    val (aRawPairs, aRawHot) = pairMass(
      Multimodal.audioBitBands(bits),
      Seq("n_windows", "band", "band_key"))
    val (aUniqPairs, aUniqHot) = pairMass(
      Multimodal.audioBitBands(aUniq.withColumn("media_id", lit(0L))),
      Seq("n_windows", "band", "band_key"))
    val aGroups = groupStats(bits,
      Seq("n_windows", "n_bits", "fa", "fb"))
    println(s"[media-band] m11 audio: rows=$an uniq_prints=$au " +
      s"raw_pairs=$aRawPairs (hot=$aRawHot) uniq_pairs=$aUniqPairs " +
      s"(hot=$aUniqHot) ratio=${r1(aRawPairs.toDouble / math.max(1L, aUniqPairs))}")

    val json =
      s"""{"src":"$sfDir","visual":{"rows":$n,"uniq_prints":$u,""" +
        s""""raw_pairs":$rawPairs,"raw_hot_bucket":$rawHot,""" +
        s""""uniq_pairs":$uniqPairs,"uniq_hot_bucket":$uniqHot,$vGroups},""" +
        s""""audio":{"rows":$an,"uniq_prints":$au,""" +
        s""""raw_pairs":$aRawPairs,"raw_hot_bucket":$aRawHot,""" +
        s""""uniq_pairs":$aUniqPairs,"uniq_hot_bucket":$aUniqHot,$aGroups}}"""
    println(s"[media-band] $json")
    outJson.foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
