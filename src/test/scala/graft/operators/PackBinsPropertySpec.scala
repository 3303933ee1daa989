package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** t13 packing invariants on GENERATED corpora at TWO budgets (VERDICT r6
  * #6): the budget used to be a literal 256 hardcoded independently in the
  * engine query and its oracle — a change to one side would have skewed
  * every (bin, offset) silently, because the packing is self-consistent at
  * ANY budget. These properties pin what must hold regardless of budget,
  * so the single shared [[PipelineQueries.PackBudget]] constant plus this
  * spec make a budget change loud instead of silent:
  *
  *  - bin_offset ∈ [0, budget)
  *  - bin_id nondecreasing per source in doc_id order (greedy fill)
  *  - conservation: bin_id*budget + bin_offset == exclusive prefix sum,
  *    and the last doc's end position == the source's total token count
  *  - straddle: a doc starts in bin (cum_before DIV budget) even when it
  *    crosses the boundary (fill-then-spill, no fragmentation holes)
  */
class PackBinsPropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.pureApply(Gen.Parameters.default, Seed(seed))

  /** (source, doc_id, text) with token counts 0..~40 — includes empty and
    * whitespace-only docs (0 tokens) and docs longer than the small
    * budget (the straddle case at budget 64 and even 256).
    */
  private def corpus(seed: Long): Seq[(String, Long, String)] = {
    val doc = for {
      src <- Gen.oneOf("web", "news", "src3", "forum7")
      n <- Gen.frequency(1 -> Gen.const(0), 1 -> Gen.choose(300, 400),
        8 -> Gen.choose(1, 40))
      ws <- Gen.oneOf("", " ", "   ")
    } yield (src, ws + Seq.fill(n)("tok").mkString(" "))
    sample(Gen.listOfN(120, doc), seed).zipWithIndex
      .map { case ((s, t), i) => (s, i.toLong, t) }
  }

  for (budget <- Seq(64, PipelineQueries.PackBudget)) {
    test(s"property: packing invariants hold at budget $budget") {
      val rows = corpus(42L) ++ corpus(43L).map { case (s, i, t) =>
        (s, i + 1000L, t) }
      val docs = rows.toDF("source", "doc_id", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .withColumn("lang", lit("en"))
      val got = PipelineQueries.packBins(docs, budget)
        .orderBy(col("source"), col("doc_id")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))

      assert(got.length === rows.length)
      // offsets within the budget, bins non-negative
      for ((src, id, _, bin, off) <- got) {
        assert(off >= 0 && off < budget, s"offset $off at $src/$id")
        assert(bin >= 0, s"bin $bin at $src/$id")
      }
      got.groupBy(_._1).foreach { case (src, perSrc) =>
        val inOrder = perSrc.sortBy(_._2)
        // greedy fill: bins never rewind within a shard
        inOrder.sliding(2).foreach {
          case Array((_, idA, _, binA, _), (_, idB, _, binB, _)) =>
            assert(binA <= binB, s"$src: bin rewound $binA -> $binB " +
              s"between docs $idA and $idB")
          case _ => ()
        }
        // conservation: (bin, offset) IS the exclusive prefix sum — no
        // token ever skipped or double-packed, straddling docs included
        var cum = 0L
        for ((_, id, n, bin, off) <- inOrder) {
          assert(bin * budget + off === cum,
            s"$src/$id: bin $bin offset $off != exclusive prefix $cum")
          cum += n
        }
        val (_, lastId, lastN, lastBin, lastOff) = inOrder.last
        assert(lastBin * budget + lastOff + lastN === cum,
          s"$src: last doc $lastId end != total token count $cum")
      }
    }
  }

  test("chunked prefix sum equals the direct per-source window at any chunk size") {
    // the r8 two-level restructure must be INVISIBLE in the output: pin
    // the chunked form (tiny chunks -> many per-source chunks, the
    // cascade actually exercised) against an inline replica of the
    // direct single-window form on the same generated corpus
    val rows = corpus(44L)
    val docs = rows.toDF("source", "doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))
    val direct = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      docs
        .withColumn("n_tokens",
          graft.functions.TextFns.tokenCount(col("text")).cast("long"))
        .withColumn("cum_before",
          coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("source"), col("doc_id"), col("n_tokens"),
          expr("cum_before DIV 64").as("bin_id"),
          (col("cum_before") % 64).as("bin_offset"))
    }.orderBy(col("source"), col("doc_id")).collect().toSeq
    for (chunkSize <- Seq(1, 7, 16, 1 << 20)) {
      val chunked = PipelineQueries.packBins(docs, 64, chunkSize)
        .orderBy(col("source"), col("doc_id")).collect().toSeq
      assert(chunked === direct, s"chunkSize $chunkSize")
    }
  }

  test("straddle: a 300+-token doc spans bins but starts at its prefix") {
    val docs = Seq(
      ("web", 0L, Seq.fill(50)("tok").mkString(" ")),
      ("web", 1L, Seq.fill(300)("tok").mkString(" ")), // straddles at 64/256
      ("web", 2L, Seq.fill(10)("tok").mkString(" ")))
      .toDF("source", "doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))
    val at64 = PipelineQueries.packBins(docs, 64)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(3), r.getLong(4)))
    // doc0: prefix 0 → (0,0); doc1: prefix 50 → (0,50) even though it
    // spills far past bin 0; doc2: prefix 350 → (5,30)
    assert(at64.toSeq === Seq((0L, 0L), (0L, 50L), (5L, 30L)))
  }
}
