package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** s20: sign-quantization invariants beyond the fixture values the DuckDB
  * oracle pins — the bit layout of the packed words (LSB = lowest
  * dimension, word boundary at dim 32, the exact convention the oracle's
  * `1::BIGINT << i` mirrors), perfect recall on a fixture where signs
  * fully determine the neighborhood, and zero recall when every code is
  * identical (Hamming degenerates to the id tiebreak while cosine does
  * not — quantization's failure mode, pinned on purpose).
  */
class SignQuantSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  // dims 1,2 positive pattern per quadrant; rest negative
  private def quad(a: Double, b: Double, noise: Double): Seq[Float] =
    (Seq(a, b) ++ Seq.fill(62)(-1.0 + noise)).map(_.toFloat)

  test("packed words: LSB is dim 1, word b starts at dim 33") {
    // dims 1 and 3 set in word a; dim 33 and 64 set in word b
    val v = Array.fill(64)(-1.0f)
    v(0) = 1f; v(2) = 1f; v(32) = 1f; v(63) = 1f
    val out = SimilarityOps.signQuantRecall(
      vecs(0L -> v.toSeq, 1L -> Seq.fill(64)(-1.0f)),
      vecs(0L -> v.toSeq), k = 1, dim = 64)
      .select("qa", "qb").head()
    assert(out.getLong(0) === ((1L << 0) | (1L << 2)))
    assert(out.getLong(1) === ((1L << 0) | (1L << 31)))
    // zero vector counts as non-negative everywhere: all 32 bits set
    val z = SimilarityOps.signQuantRecall(
      vecs(0L -> Seq.fill(64)(0.0f), 1L -> Seq.fill(64)(-1.0f)),
      vecs(0L -> Seq.fill(64)(0.0f)), k = 1, dim = 64)
      .select("qa", "qb").head()
    assert(z.getLong(0) === 0xFFFFFFFFL && z.getLong(1) === 0xFFFFFFFFL)
  }

  test("sign-separable clusters: recall@1 is perfect") {
    // two sign-opposite clusters; within a cluster signs agree exactly,
    // so Hamming(same-cluster) = 0 < Hamming(cross) = 64 and the id
    // tiebreak picks the same neighbor cosine picks (nearest = twin)
    val corpus = vecs(
      0L -> quad(1, 1, 0.1), 1L -> quad(1, 1, 0.11),
      2L -> quad(-1, -1, -0.1).map(-_), 3L -> quad(-1, -1, -0.11).map(-_))
    val out = SimilarityOps
      .signQuantRecall(corpus, corpus.filter($"vec_id" < 2), k = 1, dim = 64)
      .orderBy("query_id")
      .select("n_hits").as[Long].collect().toSeq
    assert(out === Seq(1L, 1L))
  }

  test("all-identical codes: Hamming carries no signal, recall collapses") {
    // every vector all-positive (one shared code) but cosine-distinct;
    // query 9's cosine-nearest is far from the Hamming-tiebreak pick
    val corpus = vecs((0L to 9L).map(i =>
      i -> (Seq(1.0f + i) ++ Seq.fill(63)(0.5f))): _*)
    val out = SimilarityOps
      .signQuantRecall(corpus, corpus.filter($"vec_id" === 9L), k = 1, dim = 64)
      .select("n_hits").as[Long].head()
    // Hamming all-zero → rank by corpus_id → picks id 0; cosine@k=1 picks 8
    assert(out === 0L)
  }
}
