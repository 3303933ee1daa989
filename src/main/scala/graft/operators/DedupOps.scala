package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Deduplication operators for the training-data pipeline: exact, MinHash+LSH
  * near-dup, SimHash near-dup — each built as per-row signature computation
  * (no shuffle) followed by a single signature-keyed shuffle, which is the
  * scale-correct shape: at 100 TB the only data movement is (id, signature)
  * pairs, never document text.
  */
object DedupOps {

  /** Exact dedup by content hash: one canonical (min-id) row per digest.
    * Shuffle is on the 16-byte digest, partial-aggregated map-side.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** IDs to drop under exact dedup (all but the canonical row per digest). */
  def exactDedupDrops(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val d = docs.withColumn("digest", md5(col(textCol).cast("binary")))
    val keep = exactDedup(docs, idCol, textCol)
    d.join(broadcastIfSmall(keep), Seq("digest"))
      .filter(col(idCol) =!= col("keep_id"))
      .select(col(idCol), col("digest"), col("keep_id"))
  }

  // Broadcast hint only helps when the digest table fits; at full scale
  // Catalyst/AQE picks SMJ — the hint is advisory, not load-bearing.
  private def broadcastIfSmall(df: DataFrame): DataFrame = df

  /** MinHash+LSH near-duplicate candidate pairs over word shingles.
    *
    * Stages (classic shingle→minhash→band→bucket-join):
    *  1. per row: shingles → k-wide signature → `bands` band keys (no shuffle)
    *  2. explode band keys (×bands row growth of tiny rows)
    *  3. self-join on (band_index, band_key) — the ONLY shuffle, keyed on
    *     the band hash, so each bucket is colocated; skew from giant
    *     buckets is bounded by the band hash's 64-bit range
    *  4. distinct candidate pairs (a < b)
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, shingleWords: Int = 3): DataFrame = {
    val sigs = docs.select(
      col(idCol).as("id"),
      TextFns.minhashSignatureFast(
        TextFns.wordShingles(col(textCol), shingleWords), k).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("id"),
        posexplode(TextFns.lshBandKeys(col("sig"), k, bands))
          .as(Seq("band", "band_key")))
    val a = sigs.as("a")
    val b = sigs.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Verify candidate pairs with exact n-gram Jaccard ≥ threshold (the
    * second stage of the standard LSH pipeline). Joins text back to the
    * candidate pairs — candidates are few, so the joins broadcast the pair
    * list at realistic scales.
    */
  def minhashVerified(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 16, bands: Int = 4,
      shingleWords: Int = 3): DataFrame = {
    val cands = minhashCandidates(docs, idCol, textCol, k, bands, shingleWords)
    val sh = docs.select(col(idCol).as("jid"),
      TextFns.wordShingles(col(textCol), shingleWords).as("sh"))
    cands
      .join(sh.withColumnRenamed("jid", "id_a").withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("jid", "id_b").withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .withColumn("jaccard", TextFns.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash near-dup pairs via block-permutation bucketing: the signature
    * is cut into `maxHamming + 1` bit slices, so by pigeonhole any pair
    * within Hamming distance ≤ maxHamming agrees on at least one whole
    * slice and is co-bucketed — candidate recall is complete for the
    * requested radius (more slices = shorter keys = more candidates, the
    * standard recall/cost trade).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32,
      s"maxHamming=$maxHamming out of range: slices need ≥2 bits each")
    val nSlices = maxHamming + 1
    val bounds = (0 to nSlices).map(i => i * 64 / nSlices) // slice bit edges
    val sigs = docs.select(col(idCol).as("id"),
      TextFns.simhash64Fast(TextFns.tokens(col(textCol))).as("sig"))
      .filter(col("sig").isNotNull)
    val sliced = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until nSlices).map { b =>
        val width = bounds(b + 1) - bounds(b)
        val mask = if (width == 64) -1L else (1L << width) - 1L
        shiftrightunsigned(col("sig"), bounds(b)).bitwiseAND(mask)
      }: _*))
        .as(Seq("slice", "slice_key")))
    val a = sliced.as("a")
    val b = sliced.as("b")
    a.join(b,
        col("a.slice") === col("b.slice") &&
        col("a.slice_key") === col("b.slice_key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        TextFns.hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
