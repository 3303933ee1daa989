package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Construction-forced invariants for the eval/selection operators added
  * in round 10 session 2 — properties that must hold EXACTLY, on data
  * built so the expected answer is provable, complementing the DuckDB
  * oracles (which pin cross-engine agreement, not semantics).
  */
class EvalOpsPropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(13)

  test("matryoshka recall is exactly 1.0 when all information lives in " +
    "the prefix") {
    // tail dims all zero ⇒ prefix cosine == full cosine ⇒ identical ranking
    val corpus = (0L until 40L).map { i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat) ++ Array.fill(24)(0f))
    }.toDF("vec_id", "embedding")
    val got = SimilarityOps.matryoshkaRecall(corpus,
      corpus.filter(col("vec_id") < 5), k = 5,
      prefixes = Seq(8, 16), fullDim = 32).collect()
    assert(got.length === 10) // 2 prefixes × 5 queries
    assert(got.forall(_.getAs[Double](3) === 1.0),
      "zero-tail vectors must give perfect prefix recall")
  }

  test("pq ADC recall is exactly 1.0 at k = N-1: both rankings contain " +
    "every candidate") {
    val n = 12
    val corpus = (0L until n.toLong).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    // at k = n-1 both top sets are the full candidate set (each query has
    // n-1 candidates), so hits == k and recall == 1 regardless of the
    // quantization error — the construction-forced case:
    val full = SimilarityOps.pqAdcRecall(corpus,
      corpus.filter(col("vec_id") < 4), corpus.filter(col("vec_id") < 8),
      k = n - 1, halfDim = 8).collect()
    assert(full.length === 4)
    assert(full.forall(_.getAs[Double](2) === 1.0),
      "k = N-1 must give recall 1.0 by construction")
    // and the eval never exceeds 1.0 nor goes negative at a lossy k
    val lossy = SimilarityOps.pqAdcRecall(corpus,
      corpus.filter(col("vec_id") < 4), corpus.filter(col("vec_id") < 8),
      k = 3, halfDim = 8).collect()
    assert(lossy.forall { r =>
      val rec = r.getAs[Double](2); rec >= 0.0 && rec <= 1.0 })
  }

  test("ccnet buckets: per-source tercile sizes are the ceil-rank splits") {
    val got = graft.SparkEntry.queries("t25_ccnet_buckets")(
      spark, "/root/testdata/sf0.001").collect()
    val bySource = got.groupBy(_.getString(1))
    assert(bySource.nonEmpty)
    for ((src, rows) <- bySource) {
      val n = rows.length
      val heads = rows.count(_.getString(3) == "head")
      val mids = rows.count(_.getString(3) == "middle")
      // value-threshold semantics: ties at a cut can only GROW a lower
      // bucket past its rank split, never shrink it
      assert(heads >= (n + 2) / 3 - 0 && heads <= n, s"$src heads=$heads n=$n")
      // distinct xents (the generic case) give the exact ceil splits
      if (rows.map(_.getDouble(2)).distinct.length == n) {
        assert(heads === (n + 2) / 3, s"$src heads=$heads n=$n")
        assert(heads + mids === (2 * n + 2) / 3, s"$src mid split n=$n")
      }
    }
  }

  test("dsir: a doc assembled from target-only vocabulary outranks one " +
    "from raw-only vocabulary") {
    // target speaks gammas, raw speaks deltas — a gamma doc scored against
    // this pair must carry a strictly higher log-weight than a delta doc
    val target = (0L until 5L).map(i =>
      (i, (0 until 40).map(j => s"gamma${(i + j) % 25}").mkString(" ")))
      .toDF("doc_id", "text")
    val raw = Seq(
      (10L, (0 until 40).map(j => s"gamma${j % 25}").mkString(" ")),
      (11L, (0 until 40).map(j => s"delta${j % 25}").mkString(" ")))
      .toDF("doc_id", "text")
    val w = RelevanceOps.dsirLogWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(10L) > w(11L),
      s"target-like doc ${w(10L)} must outrank raw-like ${w(11L)}")
  }
}
