package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** s26: invariants of the composed serving stack — probing every cell
  * with a corpus-covering candidate budget reduces to the exact search;
  * with nprobe 1 and a cell-covering budget the Hamming stage cannot
  * drop a cell member, so the result equals the s13 single-probe cosine
  * eval (cross-surface pin through the shared bestCentroid assignment);
  * and a query routed to an empty cell reports starvation (n_cand 0,
  * recall 0), never vanishes.
  */
class IvfRerankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  private val corpus = vecs((0L to 9L).map { i =>
    i -> Seq(
      (if (i % 2 == 0) 1.0 else -1.0) * (1.0 + 0.2 * i),
      (if (i % 3 == 0) 1.0 else -1.0) * (0.6 + 0.1 * i),
      0.8 - 0.15 * i,
      (if (i < 5) -0.3 else 0.5) + 0.07 * i).map(_.toFloat)
  }: _*)
  private val queries = corpus.filter($"vec_id" < 3)
  private val cents = corpus.filter($"vec_id" < 4)

  test("all cells probed + covering budget: recall is exactly 1.0") {
    val out = SimilarityOps.ivfRerankRecall(corpus, cents, queries,
      k = 2, nprobe = 4, overfetch = 5, dim = 4) // all 4 cells, candN = 10
      .select("recall_at_2").as[Double].collect().toSeq
    assert(out === Seq(1.0, 1.0, 1.0))
  }

  test("nprobe 1 with a cell-covering budget equals the s13 cosine eval") {
    val s26 = SimilarityOps.ivfRerankRecall(corpus, cents, queries,
      k = 2, nprobe = 1, overfetch = 5, dim = 4) // candN = 10 >= any cell
      .select("query_id", "n_hits").as[(Long, Long)].collect().toMap
    val s13 = SimilarityOps.filteredProbeRecall(corpus, cents, queries,
      k = 2).select("query_id", "n_hits").as[(Long, Long)].collect().toMap
    assert(s26 === s13)
  }

  test("a query routed to an empty cell reports starvation") {
    // corpus clusters at +x and assigns to centroid 0; centroid 1 points
    // at -x and attracts no corpus vector; the -x query routes there
    val c = vecs((0L to 4L).map(i =>
      i -> Seq(1.0f, 0.1f * i, 0f, 0f)): _*)
    val cents2 = vecs(
      0L -> Seq(1.0f, 0.1f, 0f, 0f), 1L -> Seq(-1.0f, 0f, 0f, 0f))
    val q = vecs(99L -> Seq(-1.0f, 0.05f, 0f, 0f))
    val out = SimilarityOps.ivfRerankRecall(c, cents2, q, k = 2,
      nprobe = 1, overfetch = 2, dim = 4)
      .select("n_cand", "n_hits", "recall_at_2")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((0L, 0L, 0.0)))
  }
}
