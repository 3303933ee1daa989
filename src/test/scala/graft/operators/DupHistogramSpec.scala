package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** d28: bucket edges the sf-data oracle can't isolate — exact powers of
  * two must land in their OWN bucket (the reason the chain is integer
  * comparisons, not float log2), the cap bucket absorbs everything
  * above, and the doc counts conserve the corpus.
  */
class DupHistogramSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def corpusOf(copies: Int*) =
    copies.zipWithIndex.flatMap { case (n, c) =>
      (0 until n).map(i => (c * 1000L + i, s"cluster $c body"))
    }.toDF("doc_id", "text")

  test("power-of-two edges, the cap, and conservation") {
    // cluster sizes 1, 2, 3, 4, 8, 9, 300 with maxBucket 128
    val corpus = corpusOf(1, 2, 3, 4, 8, 9, 300)
    val out = DedupOps.dupClusterHistogram(corpus, "doc_id", "text")
      .orderBy("bucket_lo")
      .select("bucket_lo", "n_clusters", "n_docs")
      .as[(Int, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1, 1L, 1L),        // size 1
      (2, 2L, 5L),        // sizes 2 and 3
      (4, 1L, 4L),        // exactly 4 is bucket 4, not 2
      (8, 2L, 17L),       // sizes 8 and 9
      (128, 1L, 300L)))   // cap absorbs 300
    assert(out.map(_._3).sum === 1 + 2 + 3 + 4 + 8 + 9 + 300)
  }

  test("share millis floor-divide against the corpus total") {
    val corpus = corpusOf(3, 1) // 4 docs: 3-copy cluster + singleton
    val shares = DedupOps.dupClusterHistogram(corpus, "doc_id", "text")
      .orderBy("bucket_lo")
      .select("doc_share_milli").as[Long].collect().toSeq
    assert(shares === Seq(250L, 750L)) // 1000*1/4, 1000*3/4
  }
}
