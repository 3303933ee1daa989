package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** s24: two-stage retrieval invariants beyond the fixture values the
  * DuckDB oracle pins — (1) a candidate set covering the whole corpus
  * makes the re-rank IS the exact search (recall 1.0 exactly); (2) with
  * overfetch 1 the re-rank can only permute the stage-1 set, so both
  * recalls coincide and match s20's single-stage eval (cross-surface
  * consistency: s24 stage 1 == s20 by construction through
  * [[SimilarityOps.signPackWord]]); (3) on s20's quantization-blind
  * fixture (one shared code, cosine-distinct vectors) the Hamming cut is
  * noise but a wide-enough re-rank rescues recall to 1.0 — the measured
  * lift that justifies the second stage.
  */
class RerankRecallSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  // 8 deterministic, pairwise-distinct 4-dim vectors with mixed signs
  private val mixed = vecs((0L to 7L).map { i =>
    i -> Seq(
      (if (i % 2 == 0) 1.0 else -1.0) * (1.0 + 0.3 * i),
      (if (i % 3 == 0) 1.0 else -1.0) * (0.5 + 0.2 * i),
      0.7 - 0.1 * i,
      (if (i < 4) -0.4 else 0.6) + 0.05 * i).map(_.toFloat)
  }: _*)

  test("candidates covering the corpus: re-rank recall is exactly 1.0") {
    val out = SimilarityOps
      .rerankRecall(mixed, mixed.filter($"vec_id" < 3), k = 2,
        overfetch = 4, dim = 4) // candN = 8 >= corpus size
      .orderBy("query_id")
      .select("recall_reranked_at_2").as[Double].collect().toSeq
    assert(out === Seq(1.0, 1.0, 1.0))
  }

  test("overfetch 1: both cuts coincide and match s20's eval") {
    val q = mixed.filter($"vec_id" < 3)
    val out = SimilarityOps
      .rerankRecall(mixed, q, k = 2, overfetch = 1, dim = 4)
      .orderBy("query_id")
      .select("n_hits_hamming", "n_hits_reranked")
      .as[(Long, Long)].collect().toSeq
    // re-ranking exactly k candidates returns the same k ids
    assert(out.forall { case (h, r) => h == r })
    val s20 = SimilarityOps.signQuantRecall(mixed, q, k = 2, dim = 4)
      .orderBy("query_id").select("n_hits").as[Long].collect().toSeq
    assert(out.map(_._1) === s20)
  }

  test("quantization-blind corpus: re-rank rescues collapsed recall") {
    // one shared sign code (all components positive), cosine-distinct —
    // Hamming degenerates to the id tiebreak; candN covers the corpus so
    // the re-rank recovers the exact neighborhood anyway
    val corpus = vecs((0L to 9L).map(i =>
      i -> Seq(1.0f + i, 0.5f, 0.5f, 0.5f)): _*)
    val out = SimilarityOps
      .rerankRecall(corpus, corpus.filter($"vec_id" === 9L), k = 3,
        overfetch = 3, dim = 4) // candN = 9 = corpus - 1
      .select("recall_hamming_at_3", "recall_reranked_at_3")
      .as[(Double, Double)].head()
    // query 9's cosine-nearest are the high-magnitude ids (8, 7, 6); the
    // Hamming tiebreak picks ids 0, 1, 2 — zero overlap
    assert(out._1 === 0.0)
    assert(out._2 === 1.0)
  }
}
