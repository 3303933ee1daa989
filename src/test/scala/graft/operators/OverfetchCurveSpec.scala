package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** s25: overfetch-sweep invariants — monotonicity (a larger candidate
  * budget's candidate set is a strict superset, so re-ranked recall can
  * only rise), per-config identity with s24 (the sweep's every slice
  * must equal the single-config eval it summarizes — the two surfaces
  * share signCandidates by construction, this pins the sweep plumbing),
  * and saturation at corpus-covering budgets.
  */
class OverfetchCurveSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  // the quantization-blind shape: one shared sign code, cosine-distinct —
  // the worst case for stage 1, so the curve actually climbs
  private val corpus = vecs((0L to 11L).map(i =>
    i -> Seq(1.0f + i, 0.5f, 0.5f, 0.5f)): _*)
  private val queries = corpus.filter($"vec_id" >= 10L)

  test("recall is monotone in the candidate budget and saturates") {
    val out = SimilarityOps.overfetchCurve(corpus, queries, k = 2,
      overfetches = Seq(1, 2, 4, 6), dim = 4)
      .groupBy("overfetch")
      .agg(org.apache.spark.sql.functions.sum("n_hits").as("hits"))
      .orderBy("overfetch")
      .select("hits").as[Long].collect().toSeq
    assert(out === out.sorted)
    // budget 6·2 = 12 > corpus-1: the re-rank IS the exact search
    assert(out.last === 4L) // 2 queries × k=2, all hit
  }

  test("each config of the sweep equals the single-config s24 eval") {
    val sweep = SimilarityOps.overfetchCurve(corpus, queries, k = 2,
      overfetches = Seq(1, 3), dim = 4)
      .select("overfetch", "query_id", "n_hits")
      .as[(Int, Long, Long)].collect()
      .map { case (c, q, n) => (c, q) -> n }.toMap
    Seq(1, 3).foreach { c =>
      val single = SimilarityOps.rerankRecall(corpus, queries, k = 2,
        overfetch = c, dim = 4)
        .select("query_id", "n_hits_reranked")
        .as[(Long, Long)].collect()
      single.foreach { case (q, n) =>
        assert(sweep((c, q)) === n, s"overfetch=$c query=$q")
      }
    }
  }
}
