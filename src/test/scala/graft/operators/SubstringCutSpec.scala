package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d29 substring cut: hand-computable fixtures at L=4 (exact kept text for
  * isolated and merged covered intervals, boundary docs), null/empty text
  * behavior, and the d19 round-trip on real data — the cut removes
  * EXACTLY the positions d19 counts.
  */
class SubstringCutSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def cut(docs: DataFrame, L: Int = 4): Seq[(Long, Option[Long], Option[Long], Option[Long], Option[String])] =
    DedupOps.substringCut(docs, "doc_id", "text", L)
      .orderBy("doc_id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[String])]
      .collect().toSeq

  test("isolated repeated span is cut from both docs, unique context kept") {
    val span = "w1 w2 w3 w4"
    val docs = Seq(
      (1L, s"a b $span c d"),  // span at 1-based 3..6
      (2L, s"$span x y z")     // span at 1..4
    ).toDF("doc_id", "text")
    // only the [w1 w2 w3 w4] window repeats (all others carry unique
    // context), so the covered interval is exactly the span
    assert(cut(docs) === Seq(
      (1L, Some(8L), Some(4L), Some(4L), Some("a b c d")),
      (2L, Some(7L), Some(3L), Some(4L), Some("x y z"))))
  }

  test("overlapping repeated windows merge into one interval; full coverage keeps ''") {
    val docs = Seq(
      (1L, "p q r s t u"),
      (2L, "p q r s t u v")
    ).toDF("doc_id", "text")
    // shared prefix "p q r s t u": repeated window starts 1,2,3 in both
    // docs union to [1,7) — doc 1 fully covered (empty string, NOT
    // null), doc 2 keeps only its unique tail
    assert(cut(docs) === Seq(
      (1L, Some(6L), Some(0L), Some(6L), Some("")),
      (2L, Some(7L), Some(1L), Some(6L), Some("v"))))
  }

  test("two disjoint repeated spans cut separately, gap kept") {
    val a = "a1 a2 a3 a4"
    val b = "b1 b2 b3 b4"
    val docs = Seq(
      (1L, s"$a g1 g2 g3 g4 g5 $b"),   // spans at 1..4 and 10..13
      (2L, s"$a x1 x2 x3 x4 x5 $b")
    ).toDF("doc_id", "text")
    // the gap middles differ, so windows bridging a span and the gap are
    // unique; each doc cuts [1,5) and [10,14), keeping its own middle
    assert(cut(docs) === Seq(
      (1L, Some(13L), Some(5L), Some(8L), Some("g1 g2 g3 g4 g5")),
      (2L, Some(13L), Some(5L), Some(8L), Some("x1 x2 x3 x4 x5"))))
  }

  test("no repeats, short docs, empty and null text pass through") {
    val docs = Seq(
      (1L, "all alone unique words here"),
      (2L, "tiny"),          // below L: no windows
      (3L, ""),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    assert(cut(docs) === Seq(
      (1L, Some(5L), Some(5L), Some(0L), Some("all alone unique words here")),
      (2L, Some(1L), Some(1L), Some(0L), Some("tiny")),
      (3L, Some(0L), Some(0L), Some(0L), Some("")),
      (4L, None, None, None, None)))
  }

  test("round-trips d19's coverage accounting on real data; second pass non-increasing") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val d29 = DedupOps.substringCut(docs, "doc_id", "text", 8)
    val d19 = DedupOps.substringDupStats(docs, "doc_id", "text", 8)
      .select(col("doc_id"), col("n_covered").as("c19"))
    val j = d29.join(d19, Seq("doc_id")).filter(col("n_tokens").isNotNull)
    // the cut removes exactly what the accounting counts, row for row
    assert(j.filter(col("n_covered") =!= col("c19")).isEmpty)
    assert(j.filter(col("n_kept") =!= col("n_tokens") - col("c19")).isEmpty)
    val firstTotal = j.agg(sum(col("n_covered"))).as[Long].head()
    assert(firstTotal > 0L, "fixture should contain repeated spans")
    // a second pass can only see seam-made repeats: total coverage must
    // not grow (not provably zero — the documented Lee-et-al artifact)
    val second = DedupOps.substringCut(
      d29.select(col("doc_id"), col("kept_text").as("text")),
      "doc_id", "text", 8)
    val secondTotal = second
      .agg(sum(coalesce(col("n_covered"), lit(0L)))).as[Long].head()
    assert(secondTotal <= firstTotal)
  }

  private def cutK1(docs: DataFrame, L: Int = 4): Seq[(Long, Option[Long], Option[Long], Option[Long], Option[String])] =
    DedupOps.substringCutKeepFirst(docs, "doc_id", "text", L)
      .orderBy("doc_id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[String])]
      .collect().toSeq

  test("keep-one: the globally first occurrence survives, later copies are cut") {
    val span = "w1 w2 w3 w4"
    val docs = Seq(
      (1L, s"a b $span c d"),  // first occurrence by (doc_id, pos): KEPT
      (2L, s"$span x y z"),    // later copy: cut
      (3L, s"m n o $span")     // later copy: cut
    ).toDF("doc_id", "text")
    assert(cutK1(docs) === Seq(
      (1L, Some(8L), Some(8L), Some(0L), Some(s"a b $span c d")),
      (2L, Some(7L), Some(3L), Some(4L), Some("x y z")),
      (3L, Some(7L), Some(3L), Some(4L), Some("m n o"))))
    // d29 cuts ALL copies of the same corpus
    assert(cut(docs).map(_._4) === Seq(Some(4L), Some(4L), Some(4L)))
  }

  test("keep-one: within-doc repeat keeps the earlier position") {
    val docs = Seq(
      (1L, "r1 r2 r3 r4 gap1 gap2 gap3 r1 r2 r3 r4")
    ).toDF("doc_id", "text")
    // the window repeats at 1-based starts 1 and 8; canonical = pos 1,
    // so only [8, 12) is cut
    assert(cutK1(docs) === Seq(
      (1L, Some(11L), Some(7L), Some(4L),
        Some("r1 r2 r3 r4 gap1 gap2 gap3"))))
  }

  test("keep-one is bounded by cut-all and agrees with it where no doc holds a canonical") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val all = DedupOps.substringCut(docs, "doc_id", "text", 8)
      .select(col("doc_id"), col("n_covered").as("ca"))
    val one = DedupOps.substringCutKeepFirst(docs, "doc_id", "text", 8)
      .select(col("doc_id"), col("n_covered").as("co"),
        col("n_tokens"), col("n_kept"))
    val j = one.join(all, Seq("doc_id")).filter(col("n_tokens").isNotNull)
    // keep-one can only cut a subset of cut-all's positions, per doc
    assert(j.filter(col("co") > col("ca")).isEmpty)
    assert(j.filter(col("n_kept") =!= col("n_tokens") - col("co")).isEmpty)
    // and the corpus-wide keep-one total is strictly smaller when any
    // repeats exist (some doc holds the canonical copy)
    val (ta, to) = (j.agg(sum(col("ca"))).as[Long].head(),
      j.agg(sum(col("co"))).as[Long].head())
    assert(ta > 0L && to < ta)
  }

  test("decontaminate: benchmark window cut from corpus, fresh docs untouched, bench never in output") {
    val leak = "b1 b2 b3 b4"
    val bench = Seq(
      (100L, s"question intro $leak answer tail"),
      (101L, "another eval item wholly distinct")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"web page text $leak scraped verbatim"), // carries the leak
      (2L, "clean page about something else entirely"),
      (3L, ""),                                      // empty
      (4L, null.asInstanceOf[String])                // null
    ).toDF("doc_id", "text")
    val got = DedupOps.decontaminateCut(corpus, bench, "doc_id", "text", 4)
      .orderBy("doc_id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[String])]
      .collect().toSeq
    // doc 1: the 4-token leak window (1-based 4..7) is the ONLY corpus
    // window present in the bench set (all others carry unique context)
    assert(got === Seq(
      (1L, Some(9L), Some(5L), Some(4L),
        Some("web page text scraped verbatim")),
      (2L, Some(6L), Some(6L), Some(0L),
        Some("clean page about something else entirely")),
      (3L, Some(0L), Some(0L), Some(0L), Some("")),
      (4L, None, None, None, None)))
    // a repeat WITHIN the corpus that is absent from the bench set is
    // NOT decontamination's business (that's d29/d33)
    val selfRep = Seq(
      (1L, "s1 s2 s3 s4 once"),
      (2L, "s1 s2 s3 s4 twice")).toDF("doc_id", "text")
    val kept = DedupOps.decontaminateCut(selfRep, bench, "doc_id",
        "text", 4)
      .agg(sum(col("n_covered"))).as[Long].head()
    assert(kept === 0L)
  }

  test("decontaminate: bench == the d19 repeat universe makes the cut agree with substringCut on cross-set spans") {
    // when every corpus window that repeats does so ONLY via the bench
    // doc (no intra-corpus repeats), decontaminateCut(corpus, bench)
    // must equal substringCut(corpus ∪ bench) restricted to corpus rows
    val span = "x1 x2 x3 x4 x5"
    val bench = Seq((100L, s"eval begins $span eval ends"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"alpha $span omega"),
      (2L, "unrelated corpus document sits here")
    ).toDF("doc_id", "text")
    val viaDecon = DedupOps.decontaminateCut(corpus, bench, "doc_id",
        "text", 4)
      .orderBy("doc_id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[String])]
      .collect().toSeq
    val viaJoint = DedupOps.substringCut(corpus.union(bench), "doc_id",
        "text", 4)
      .filter(col("doc_id") < 100L).orderBy("doc_id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[String])]
      .collect().toSeq
    assert(viaDecon === viaJoint)
  }

  // the shared interval kernel now has FOUR consumers (d29, d33, t47,
  // and the streaming cut) — a randomized differential against a plain
  // driver-side boolean mask hardens the fold all of them stand on
  test("property: cut kernel == driver boolean-mask reference on random start sets") {
    val rnd = new scala.util.Random(0xBEEF)
    for (trial <- 1 to 30) {
      val l = 2 + rnd.nextInt(5)            // window length 2..6
      val m = l + rnd.nextInt(40)           // tokens l..l+39
      val tokens = Vector.tabulate(m)(i => s"tk$i")
      val maxStart = m - l + 1              // valid 1-based window starts
      val starts = (1 to maxStart)
        .filter(_ => rnd.nextInt(4) == 0)   // ~25% of windows cut
      // driver reference: mark [p, p+l) per start, keep unmarked
      val cut = Array.fill(m)(false)
      starts.foreach(p =>
        (p - 1 until math.min(p - 1 + l, m)).foreach(cut(_) = true))
      val expected = tokens.indices.filterNot(cut).map(tokens).mkString(" ")
      val df = Seq((1L, tokens.mkString(" ")))
        .toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.functions.TextFns.tokens(col("text")).as("ts"),
          lit(starts.toArray).as("ss"))
        .withColumn("iv", DedupOps.coveredIntervalsExpr(col("ss"), l))
        .withColumn("kept", DedupOps.keptTokensExpr(col("ts"), col("iv")))
        .select(array_join(col("kept"), " "))
      assert(df.as[String].head() === expected,
        s"trial=$trial l=$l m=$m starts=$starts")
    }
  }
}
