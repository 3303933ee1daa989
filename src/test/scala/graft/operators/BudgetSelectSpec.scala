package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** budgetSelect (t39) pinned against a driver-side naive scan of the same
  * total order, plus the band-decomposition invariances the two-level
  * prefix sum must satisfy; splitLeakage (t38) pinned on a hand fixture.
  */
class BudgetSelectSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = (0 until n).map { i =>
    // varied lengths/content so scores and token counts spread
    (i.toLong, ("lorem ipsum dolor sit " * (1 + i % 7)) +
      ("x" * (i % 5)) + s" doc $i")
  }.toDF("doc_id", "text")

  test("budget selection equals the naive ordered scan, drops the " +
    "crossing doc, and is band/partitioning invariant") {
    val docs = corpus(60)
    val budget = 800L
    val got = PipelineQueries.budgetSelect(docs, budget)
      .as[(Long, Long, Long, Long)].collect()

    // independent naive reference: score/token the docs with the shared
    // expressions, then do the ordered scan DRIVER-SIDE — no window, no
    // chunking, so the two-level machinery is what's under test
    val rows = docs.select(col("doc_id"),
        PipelineQueries.eduScoreMicro(col("text")).as("s"),
        graft.functions.TextFns.tokenCount(col("text")).cast("long").as("n"))
      .as[(Long, Long, Long)].collect()
      .sortBy { case (id, s, _) => (-s, id) }
    val cums = rows.scanLeft(0L)((a, r) => a + r._3).tail
    val naive = rows.zip(cums).takeWhile(_._2 <= budget)
      .map { case ((id, s, n), c) => (id, s, n, c) }
    assert(got.toSeq === naive.toSeq)
    // the crossing doc and everything after it drop
    assert(naive.nonEmpty && naive.length < rows.length)
    assert(cums(naive.length) > budget)
    // band width cannot change values (only the chunk decomposition)
    val narrow = PipelineQueries.budgetSelect(docs, budget, bandMicro = 7L)
      .as[(Long, Long, Long, Long)].collect()
    assert(narrow.toSeq === got.toSeq)
    // partitioning invariance of the integer fold
    val reparted = PipelineQueries
      .budgetSelect(docs.repartition(13), budget)
      .as[(Long, Long, Long, Long)].collect()
    assert(reparted.toSeq === got.toSeq)
  }

  test("split leakage: duplicated content across id-hash buckets is " +
    "counted by bucket span; an all-unique corpus is one clean row") {
    // three copies of one text under ids chosen from two distinct
    // buckets — two from one, one from another, so the span is exactly 2
    val buckets = spark.range(200)
      .select(col("id"), PipelineQueries.splitBucket(col("id")).as("b"))
      .as[(Long, Int)].collect().toMap
    val byBucket = buckets.groupBy(_._2).view
      .mapValues(_.keys.toSeq.sorted).toMap
    assert(byBucket.size >= 2, "200 md5 draws must span >= 2 buckets")
    val (bLo, bHi) = (byBucket.keys.min, byBucket.keys.max)
    assert(byBucket(bLo).size >= 2, s"bucket $bLo too small for the fixture")
    val dupIds = byBucket(bLo).take(2) :+ byBucket(bHi).head
    val docs = (dupIds.map(i => (i, "shared body")) ++
      Seq((500L, "unique a"), (501L, "unique b"))).toDF("doc_id", "text")
    val got = PipelineQueries.splitLeakage(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSeq
    // uniques: two digests at span 1 (unless 500/501 collide with bLo/bHi
    // membership — they are distinct texts, so they are their own digests)
    assert(got.toSet === Set((1L, 2L, 2L), (2L, 1L, 3L)))
    val unique = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    assert(PipelineQueries.splitLeakage(unique, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSeq === Seq((1L, 3L, 3L)))
  }
}
