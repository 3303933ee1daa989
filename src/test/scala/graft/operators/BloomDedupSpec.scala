package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** d24 invariants: the bloom probe prunes the PLAN, never the answer.
  *
  *  - equality: bloomIncrementalDedup == incrementalDedup row-for-row on
  *    generated corpora across seeds and splits (the no-false-negative
  *    property made observable — a dropped true match would surface as a
  *    missing `dup_in_corpus`)
  *  - pruning: the probed corpus side keeps every digest the batch
  *    actually contains and drops (nearly) everything else — measured by
  *    running the probe's own filter standalone; with 16 bits/item the
  *    fixture's false-positive count is deterministic (same items, same
  *    sizing, same hash) and pinned small
  *  - plan shape: the might_contain filter sits in the corpus scan stage
  *    BELOW the corpus-side aggregate, with the bloom as one subquery —
  *    the runtime-filter shape, hand-planted
  */
class BloomDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.pureApply(Gen.Parameters.default, Seed(seed))

  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val pool = (0 until 8).map(i =>
      s"bloom spec body $i alpha beta gamma delta epsilon zeta")
    val doc = Gen.frequency(
      4 -> Gen.oneOf(pool),
      3 -> Gen.alphaLowerStr.map(s => s"fresh unique $seed $s"))
    sample(Gen.listOfN(n, doc), seed).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
  }

  test("d24 == d17 row-for-row on generated corpora") {
    for (seed <- 1L to 6L) {
      val all = corpus(seed, 80).toDF("doc_id", "text")
      val corp = all.filter(col("doc_id") % 4 =!= 0)
      val batch = all.filter(col("doc_id") % 4 === 0)
      val exact = DedupOps.incrementalDedup(corp, batch, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSet
      val bloomed = DedupOps.bloomIncrementalDedup(corp, batch,
          "doc_id", "text", expectedBatchDocs = 1000L)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSet
      assert(bloomed === exact, s"seed=$seed")
    }
  }

  test("the probe keeps every true match and prunes the rest") {
    val all = corpus(7L, 200).toDF("doc_id", "text")
    val corp = all.filter(col("doc_id") % 4 =!= 0)
    val batch = all.filter(col("doc_id") % 4 === 0)
    val batchDigests = batch
      .select(DedupOps.contentDigest(col("text")).as("digest"))
      .distinct().as[String].collect().toSet
    val corpusDigests = corp
      .select(DedupOps.contentDigest(col("text")).as("digest"))
      .distinct().as[String].collect().toSet
    // replay the operator's own probe standalone
    val bloom = batch
      .select(DedupOps.contentDigest(col("text")).as("digest"))
      .agg(graft.functions.BloomFns.bloomAgg(xxhash64(col("digest")),
        1000L, 16000L).as("bf"))
    val survivors = corp
      .select(DedupOps.contentDigest(col("text")).as("digest"))
      .filter(graft.functions.BloomFns.mightContain(bloom,
        xxhash64(col("digest"))))
      .distinct().as[String].collect().toSet
    val trueMatches = corpusDigests.intersect(batchDigests)
    assert(trueMatches.subsetOf(survivors), "bloom dropped a true match")
    // deterministic false-positive count (fixed items, sizing, hash):
    // at 16 bits/item the expected count over ~100 distinct non-matching
    // digests is ≪ 1 — pin a generous but meaningful bound
    val falsePos = survivors -- trueMatches
    assert(falsePos.size <= 3,
      s"unexpectedly many bloom false positives: ${falsePos.size}")
    assert(survivors.size < corpusDigests.size,
      "the probe pruned nothing — the filter is not reaching the corpus side")
  }

  test("plan shape: might_contain filters below the corpus aggregate, bloom is one subquery") {
    val all = corpus(8L, 60).toDF("doc_id", "text")
    val df = DedupOps.bloomIncrementalDedup(
      all.filter(col("doc_id") % 4 =!= 0),
      all.filter(col("doc_id") % 4 === 0),
      "doc_id", "text", expectedBatchDocs = 1000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    // the probe must be a Filter feeding the corpus-side partial
    // aggregate (scan-stage pruning), not a post-join residual
    val optimized = df.queryExecution.optimizedPlan.toString
    val aggIdx = optimized.indexOf("in_corpus")
    val probeIdx = optimized.indexOf("might_contain")
    assert(aggIdx >= 0 && probeIdx > aggIdx,
      s"probe not below the corpus aggregate:\n$optimized")
  }
}
