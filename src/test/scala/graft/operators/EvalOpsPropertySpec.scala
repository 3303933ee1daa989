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

  test("s23 filtered ANN: candidate starvation reports 0-candidate rows, " +
    "not dropped queries") {
    def axis(i: Int, s: Double): Array[Float] = {
      val a = Array.fill(4)(0f); a(i) = s.toFloat; a
    }
    val cents = Seq((100L, axis(0, 1.0)), (101L, axis(1, 1.0)))
      .toDF("vec_id", "embedding")
    // corpus: +x rows all ODD ids, +y rows all EVEN ids
    val corpus = ((0 until 10).map(i => (2L * i + 1, axis(0, 1.0 + i))) ++
      (0 until 10).map(i => (2L * i + 40, axis(1, 1.0 + i))))
      .toDF("vec_id", "embedding")
    val query = Seq((999L, axis(0, 5.0))).toDF("vec_id", "embedding")
    // filter keeps EVEN ids → the query's +x cell is emptied entirely
    val got = SimilarityOps.filteredProbeRecall(
      corpus.filter(col("vec_id") % 2 === 0), cents, query, 5).collect()
    assert(got.length === 1, "starved query must still report")
    assert(got.head.getLong(1) === 0L && got.head.getLong(2) === 0L &&
      got.head.getDouble(3) === 0.0)
    // vacuous filter: every +x row survives → the cell holds all 10 and
    // recall is perfect (cell = exact neighborhood by construction)
    val full = SimilarityOps.filteredProbeRecall(corpus, cents, query, 5)
      .collect()
    assert(full.head.getLong(1) === 10L && full.head.getDouble(3) === 1.0)
  }

  test("t32 source KL: zero for a mix-typical source, ln 2 for a " +
    "disjoint one, token-less sources absent") {
    // disjoint case: A="x x x", B="y y y" → each source's word has
    // p_s = 1, p_c = 1/2 → KL = ln 2 exactly
    val disjoint = Seq((0L, "A", "x x x"), (1L, "B", "y y y"))
      .toDF("doc_id", "source", "text")
    val kd = RelevanceOps.sourceKl(disjoint, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val ln2 = BigDecimal(math.round(3 * math.log(2) * 1e6) / 1e6 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(kd === Map("A" -> ((3L, 1L, ln2)), "B" -> ((3L, 1L, ln2))))
    // typical case: both sources have the corpus distribution → KL = 0;
    // a source with only empty/whitespace docs reports no row
    val typical = Seq((0L, "A", "x y"), (1L, "B", "x y"),
      (2L, "C", "   ")).toDF("doc_id", "source", "text")
    val kt = RelevanceOps.sourceKl(typical, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(kt === Map("A" -> 0.0, "B" -> 0.0))
  }

  test("t31 PMI: provable micro-nat values on a forced transition table") {
    // 10 docs "p q" + 90 docs "u v" + 3 docs "r s": T = 103 (the
    // sub-threshold pair's transitions still count in the marginal
    // table — minCount gates the OUTPUT, not the statistics);
    // (p,q): c12=c1=c2=10 → pmi = ln(103·10/100); (u,v): ln(103/90).
    // (r,s) falls under minCount and must be absent.
    val docs = ((0 until 10).map(i => (i.toLong, "p q")) ++
      (0 until 90).map(i => (100L + i, "u v")) ++
      (0 until 3).map(i => (500L + i, "r s"))).toDF("doc_id", "text")
    val got = RelevanceOps.pmiCollocations(docs, "text", 5L, 30)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === Set(("p", "q"), ("u", "v")))
    assert(got(("p", "q")) === ((10L,
      math.round(math.log(103.0 * 10 / (10 * 10)) * 1e6))))  // ln 10.3
    assert(got(("u", "v")) === ((90L,
      math.round(math.log(103.0 * 90 / (90 * 90)) * 1e6))))  // ln(103/90)
  }

  test("s22 cell balance: empty cells keep a row, counts conserve, " +
    "imbalance is the provable floor division") {
    // axis-aligned construction: centroid 0 = +x captures ids 2..21
    // (all +x-ish), centroid 1 = +y captures nothing else... build
    // corpus so cell membership is forced: 20 vectors near +x, 5 near
    // +y, and a third centroid at -x that captures NOTHING.
    def axis(i: Int, s: Double): Array[Float] = {
      val a = Array.fill(4)(0f); a(i) = s.toFloat; a
    }
    val cents = Seq((0L, axis(0, 1.0)), (1L, axis(1, 1.0)),
      (2L, axis(0, -1.0))).toDF("vec_id", "embedding")
    val corpus = ((0L until 20L).map(i => (10L + i, axis(0, 2.0 + i))) ++
      (0L until 5L).map(i => (40L + i, axis(1, 1.0 + i))))
      .toDF("vec_id", "embedding")
    val rows = SimilarityOps.cellBalance(corpus, cents)
      .orderBy(col("centroid_id")).collect()
    assert(rows.length === 3, "every centroid reports, even empty")
    val byCell = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCell === Map(0L -> 20L, 1L -> 5L, 2L -> 0L))
    assert(rows.map(_.getLong(1)).sum === 25L, "conservation")
    for (r <- rows) {
      assert(r.getLong(2) === r.getLong(1) * 1000L / 25L, "milli_frac")
      assert(r.getLong(3) === 20L * 3L * 1000L / 25L, "imbalance 2400")
      assert(r.getLong(4) === 2L, "two cells used")
    }
  }

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

  test("ivf-pq: one centroid makes the cell restriction vacuous — " +
    "exactly pqAdcRecall; cells prune cross-cluster candidates") {
    val n = 12
    val corpus = (0L until n.toLong).map(i =>
      (i, Array.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 4)
    val books = corpus.filter(col("vec_id") < 8)
    val oneCell = corpus.filter(col("vec_id") === 0L)
    val restricted = SimilarityOps
      .ivfPqRecall(corpus, queries, oneCell, books, k = 3, halfDim = 8)
      .orderBy("query_id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val exhaustive = SimilarityOps
      .pqAdcRecall(corpus, queries, books, k = 3, halfDim = 8)
      .orderBy("query_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(restricted === exhaustive)

    // cell-miss priced in isolation: a high-magnitude outlier x is the
    // query's TRUE inner-product top-1 but cosine-assigns to the OTHER
    // cell (ip rewards magnitude, cell assignment ignores it). With
    // codebooks = corpus, x's code is itself, so exhaustive ADC finds it
    // (recall@1 = 1) while the cell-restricted path — SAME codes, SAME
    // query — prunes it (recall@1 = 0). The recall gap IS the cell loss.
    def unit(dim: Int, scale: Double, extraDim: Int, extra: Double) =
      Array.tabulate(16)(j => (if (j == dim) scale
        else if (j == extraDim) extra else 0.0).toFloat)
    val aSide = (0L to 4L).map(i => (i,
      unit(0, 1.0, if (i == 0) 1 else 2 + i.toInt, 0.5)))
    val bSide = (5L to 8L).map(i => (i, unit(0, -1.0, 4 + i.toInt, 0.5)))
    val outlier = Seq((9L, unit(0, -1.0, 1, 10.0)))
    val cmCorpus = (aSide ++ bSide ++ outlier).toDF("vec_id", "embedding")
    val cents = Seq((0L, unit(0, 1.0, 1, 0.0)), (1L, unit(0, -1.0, 1, 0.0)))
      .toDF("vec_id", "embedding")
    val q0 = cmCorpus.filter(col("vec_id") === 0L)
    val exhaust = SimilarityOps
      .pqAdcRecall(cmCorpus, q0, cmCorpus, k = 1, halfDim = 8)
      .head()
    assert(exhaust.getLong(1) === 1L, s"exhaustive ADC must find x: $exhaust")
    val pruned = SimilarityOps
      .ivfPqRecall(cmCorpus, q0, cents, cmCorpus, k = 1, halfDim = 8)
      .head()
    assert(pruned.getLong(1) === 0L && pruned.getLong(2) === 0L,
      s"cell restriction must prune the cross-cell outlier: $pruned")
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
