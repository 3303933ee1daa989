package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** s27: invariants of the refined IVF-PQ stack — probing every cell with
  * a corpus-covering budget reduces to the exact search (the re-rank is
  * full-precision, so a covering candidate pool erases BOTH compression
  * losses); at nprobe 1 / overfetch 1 the candidate set IS s21's ADC
  * answer set, so the re-rank can only reorder it and the hit counts
  * agree exactly (cross-operator pin through the shared pqEncode);
  * recall is monotone in overfetch (the pool only grows, and the exact
  * baseline is the re-rank metric's own global top-k); and an
  * empty-cell route reports starvation, never vanishes.
  */
class IvfPqRerankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  // 4-dim fixture: halfDim 2. Varied signs/magnitudes so cells, codes,
  // and rankings are all non-degenerate.
  private val corpus = vecs((0L to 9L).map { i =>
    i -> Seq(
      (if (i % 2 == 0) 1.0 else -1.0) * (1.0 + 0.2 * i),
      (if (i % 3 == 0) 1.0 else -1.0) * (0.6 + 0.1 * i),
      0.8 - 0.15 * i,
      (if (i < 5) -0.3 else 0.5) + 0.07 * i).map(_.toFloat)
  }: _*)
  private val queries = corpus.filter($"vec_id" < 3)
  private val cents = corpus.filter($"vec_id" < 4)
  private val books = corpus.filter($"vec_id" < 4)

  test("all cells probed + covering budget: recall is exactly 1.0") {
    val out = SimilarityOps.ivfPqRerankRecall(corpus, cents, queries, books,
      k = 2, nprobe = 4, overfetch = 5, halfDim = 2) // candN = 10
      .select("recall_at_2").as[Double].collect().toSeq
    assert(out === Seq(1.0, 1.0, 1.0))
  }

  test("nprobe 1 / overfetch 1: hit counts equal s21's unrefined ADC") {
    val s27 = SimilarityOps.ivfPqRerankRecall(corpus, cents, queries, books,
      k = 2, nprobe = 1, overfetch = 1, halfDim = 2)
      .select("query_id", "n_hits").as[(Long, Long)].collect().toMap
    val s21 = SimilarityOps.ivfPqRecall(corpus, queries, cents, books,
      k = 2, halfDim = 2)
      .select("query_id", "n_hits").as[(Long, Long)].collect().toMap
    assert(s27 === s21)
  }

  test("recall is monotone in overfetch") {
    val byOf = Seq(1, 2, 5).map { of =>
      SimilarityOps.ivfPqRerankRecall(corpus, cents, queries, books,
        k = 2, nprobe = 2, overfetch = of, halfDim = 2)
        .orderBy("query_id")
        .select("n_hits").as[Long].collect().toSeq
    }
    byOf.sliding(2).foreach { case Seq(lo, hi) =>
      lo.zip(hi).foreach { case (l, h) => assert(l <= h) }
    }
  }

  test("a query routed to an empty cell reports starvation") {
    val c = vecs((0L to 4L).map(i =>
      i -> Seq(1.0f, 0.1f * i, 0f, 0f)): _*)
    val cents2 = vecs(
      0L -> Seq(1.0f, 0.1f, 0f, 0f), 1L -> Seq(-1.0f, 0f, 0f, 0f))
    val q = vecs(99L -> Seq(-1.0f, 0.05f, 0f, 0f))
    val out = SimilarityOps.ivfPqRerankRecall(c, cents2, q, cents2, k = 2,
      nprobe = 1, overfetch = 2, halfDim = 2)
      .select("n_cand", "n_hits", "recall_at_2")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((0L, 0L, 0.0)))
  }
}
