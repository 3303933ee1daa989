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
