package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Incremental-dedup family invariants on GENERATED corpora — what must
  * hold for any corpus/batch split, beyond the fixture values the DuckDB
  * oracles pin:
  *
  *  - d17 vs an independent digest model: corpus-wins-always (a digest
  *    present in the corpus dominates ANY batch id — deliberately not
  *    union-d01's global min-id election, because the corpus copy is
  *    already ingested), then min-batch-id election among the rest
  *  - d18 vs minhashVerified agreement: a batch doc's `dup_of` is the
  *    MINIMUM corpus id among the union self-dedup's verified pairs that
  *    cross the split — the incremental operator is the split-restricted
  *    projection of the batch one, never more and never fewer matches
  *  - d17 idempotence: re-ingesting a batch against corpus ∪ kept drops
  *    every batch doc as `dup_in_corpus`
  */
class IncrementalDedupPropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.pureApply(Gen.Parameters.default, Seed(seed))

  /** Texts drawn from a SMALL pool with word-level mutations, forcing
    * exact dups, near dups, and fresh docs across any split.
    */
  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val pool = (0 until 6).map(i =>
      s"document body $i with shared words alpha beta gamma delta " +
        s"epsilon zeta eta theta iota kappa for minhash banding")
    val doc = Gen.frequency(
      5 -> Gen.oneOf(pool),
      2 -> Gen.oneOf(pool).map(_.replace("delta", "mutated")),
      1 -> Gen.const("an entirely fresh unrelated text about nothing"))
    sample(Gen.listOfN(n, doc), seed).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
  }

  test("property: d17==d01 election, d18==split-restricted union near-dup, idempotence") {
    for (seed <- 1L to 6L) {
      val rows = corpus(seed, 60)
      val all = rows.toDF("doc_id", "text")
      val corp = all.filter(col("doc_id") % 3 =!= 0)
      val batch = all.filter(col("doc_id") % 3 === 0)

      // --- d17 vs an independent digest model --------------------------
      // corpus-wins-always semantics: a digest present in the corpus
      // dominates ANY batch id (deliberately NOT union-d01's global
      // min-id election — the corpus copy is already ingested)
      val d17 = DedupOps.incrementalDedup(corp, batch, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      val dig = all.select(col("doc_id"),
          DedupOps.contentDigest(col("text")).as("dg"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val batchIds = rows.map(_._1).filter(_ % 3 == 0).toSet
      val corpDigs = rows.map(_._1).filter(_ % 3 != 0).map(dig).toSet
      assert(d17.keySet === batchIds)
      for (id <- batchIds) {
        val expected =
          if (corpDigs.contains(dig(id))) "dup_in_corpus"
          else if (id == batchIds.filter(b => dig(b) == dig(id)).min) "new_unique"
          else "dup_in_batch"
        assert(d17(id) === expected, s"seed=$seed id=$id")
      }

      // --- d18 vs minhashVerified over the union -----------------------
      val thr = 0.5
      val unionPairs = DedupOps.minhashVerified(all, "doc_id", "text",
          threshold = thr, k = 32, bands = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // pairs crossing the split, folded to (batchId -> corpus ids)
      val crossing = unionPairs.toSeq
        .flatMap { case (a, b) => Seq((a, b), (b, a)) }
        .filter { case (b, c) => b % 3 == 0 && c % 3 != 0 }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val d18 = DedupOps.incrementalNearDup(corp, batch, "doc_id", "text",
          threshold = thr, k = 32, bands = 8)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
        .toMap
      assert(d18.keySet === batchIds)
      for (id <- batchIds) {
        val expected = crossing.get(id)
        assert(d18(id)._1 === expected.map(_.min),
          s"seed=$seed id=$id d18=${d18(id)} unionCrossing=$expected")
        assert(d18(id)._2 === expected.map(_.size.toLong).getOrElse(0L),
          s"seed=$seed id=$id match count")
      }

      // --- d20 composition: triage == d17 ∘ d18-on-survivors -----------
      val d20 = DedupOps.ingestTriage(corp, batch, "doc_id", "text",
          threshold = thr, k = 32, bands = 8)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3)),
            r.getLong(4), r.getString(5))))
        .toMap
      assert(d20.keySet === batchIds)
      for (id <- batchIds) {
        val (status, nearOf, nNear, decision) = d20(id)
        assert(status === d17(id), s"seed=$seed id=$id d20 status drifted")
        if (status == "new_unique") {
          // the survivor restriction must not change a survivor's result:
          // per-bid candidate generation is independent across bids
          assert((nearOf, nNear) === d18(id), s"seed=$seed id=$id near leg")
          assert(decision ===
            (if (nearOf.isDefined) "near_dup_corpus" else "ingest"),
            s"seed=$seed id=$id decision")
        } else {
          // exact dups never reach the LSH stage
          assert(nearOf.isEmpty && nNear === 0L, s"seed=$seed id=$id pruned")
          assert(decision === status, s"seed=$seed id=$id decision")
        }
      }

      // --- d17 idempotence ---------------------------------------------
      val kept = batch.join(
        DedupOps.incrementalDedup(corp, batch, "doc_id", "text")
          .filter(col("status") === "new_unique").select("doc_id"),
        Seq("doc_id"))
      val again = DedupOps.incrementalDedup(corp.unionByName(kept), batch,
          "doc_id", "text")
        .collect().map(_.getString(2)).toSet
      assert(again === Set("dup_in_corpus"), s"seed=$seed")
    }
  }
}
