package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t28: the BPE pair statistic. Pins hand-computed pair counts, the
  * no-pair degenerate inputs (1-char words — the `sequence(1, 0)`
  * descending-sequence trap — plus empty/whitespace docs), and the
  * two-level rollup's defining equivalence: counting pairs over the
  * (word, tf) vocab table must equal counting over the raw token stream.
  */
class BpePairsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("hand-computed pair counts, weighted by word frequency") {
    val docs = Seq((0L, "hello hello world"), (1L, "hello a")).toDF("doc_id", "text")
    // hello tf=3, world tf=1, a tf=1 (no pair)
    val got = RelevanceOps.bpePairStats(docs, "text", 50)
      .collect().map(r => (r.getString(0) + r.getString(1), r.getLong(2))).toMap
    assert(got === Map(
      "he" -> 3L, "el" -> 3L, "ll" -> 3L, "lo" -> 3L,
      "wo" -> 1L, "or" -> 1L, "rl" -> 1L, "ld" -> 1L))
  }

  test("1-char words, empty and whitespace docs contribute no pairs") {
    val docs = Seq((0L, "a b c"), (1L, ""), (2L, "   ")).toDF("doc_id", "text")
    assert(RelevanceOps.bpePairStats(docs, "text", 50).count() === 0L)
  }

  test("t30: overlapping-run merge counts match BPE scan semantics") {
    // "aaa" under merge (a,a): greedy left-to-right gives [aa, a] → 2
    // tokens; "aaaa" → [aa, aa] → 2. The replace-length identity must
    // reproduce exactly that.
    val docs = Seq((0L, "aaa aaaa ab")).toDF("doc_id", "text")
    val rows = RelevanceOps.bpeApplyRound(docs, "text", 5)
      .collect().map(r => ((r.getString(1), r.getString(2)),
        (r.getInt(0), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // pairs: aa appears 2x in aaa + 3x in aaaa = 5; ab 1x; tokens_before
    // = 3 + 4 + 2 = 9 chars
    val (rankAa, cntAa, before, afterAa, mergesAa) = rows(("a", "a"))
    assert(rankAa === 1 && cntAa === 5L && before === 9L)
    assert(afterAa === 2L + 2L + 2L, "aaa→2, aaaa→2, ab→2")
    assert(mergesAa === 3L)
    val (_, cntAb, _, afterAb, mergesAb) = rows(("a", "b"))
    assert(cntAb === 1L && afterAb === 3L + 4L + 1L && mergesAb === 1L)
  }

  test("t30: rank-1 pair is t28's argmax and merges are conserved") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val top = RelevanceOps.bpePairStats(docs, "text", 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).head
    val applied = RelevanceOps.bpeApplyRound(docs, "text", 3)
      .orderBy(col("rank")).collect()
    assert((applied.head.getString(1), applied.head.getString(2),
      applied.head.getLong(3)) === top)
    for (r <- applied) {
      val (cnt, before, after, merges) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(before - after === merges)
      assert(merges > 0 && merges <= cnt,
        "each merge consumes one occurrence; overlaps can only reduce")
      assert(before === applied.head.getLong(4), "tokens_before is corpus-constant")
    }
  }

  test("vocab-rollup equivalence: same counts as the raw token stream") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val viaVocab = RelevanceOps.bpePairStats(docs, "text", 1000)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // naive: explode every token occurrence, pair, count — no vocab table
    val naive = docs
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(col("w"), explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(col("w").substr(col("i"), lit(1)).as("c1"),
        col("w").substr(col("i") + 1, lit(1)).as("c2"))
      .groupBy("c1", "c2").agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(viaVocab === naive)
  }
}
