package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** t33: eval-leakage values on a hand-computed fixture (the DuckDB oracle
  * re-verifies the same recipe on sf data and the three fixture gates),
  * the shingle-less-item NULL rule, and the d07 duality — the two reports
  * describe one contamination event from opposite sides, so "any corpus
  * doc flagged" must coincide with "any bench gram leaked".
  */
class EvalLeakageSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (10L, "x a b c y"),            // contains bench 3-gram "a b c"
    (11L, "totally unrelated words here"),
    (12L, "full copy of item two")).toDF("doc_id", "text")
  private val bench = Seq(
    (0L, "a b c d"),               // grams: "a b c", "b c d" -> 1 leaked
    (1L, "full copy of item two"), // verbatim in corpus -> fully leaked
    (2L, "hi there")               // < 3 words: no grams
  ).toDF("doc_id", "text")

  test("per-item fractions: partial, full, and shingle-less") {
    val out = DedupOps.evalLeakage(corpus, bench, "doc_id", "text", 3)
      .orderBy("bench_id")
      .select("bench_id", "n_grams", "n_leaked", "leak_milli")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(out === Seq(
      (0L, 2L, 1L, Some(500L)),
      (1L, 3L, 3L, Some(1000L)),
      (2L, 0L, 0L, None)))
  }

  test("t36: per-source attribution — hits, zero-leak feeds, and the share") {
    val srcCorpus = Seq(
      (10L, "x a b c y", "web"),             // leaks "a b c" -> item 0
      (11L, "totally unrelated words here", "web"),
      (12L, "full copy of item two", "news"), // leaks all of item 1
      (13L, "clean feed content only", "wiki")).toDF("doc_id", "text", "source")
    val out = DedupOps
      .evalLeakageBySource(srcCorpus, bench, "doc_id", "text", "source", 3)
      .orderBy("source")
      .select("source", "n_leaked_grams", "n_items_hit", "n_items_total",
        "item_share_milli")
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    assert(out === Seq(
      ("news", 3L, 1L, 3L, Some(333L)),
      ("web", 1L, 1L, 3L, Some(333L)),
      ("wiki", 0L, 0L, 3L, Some(0L))))
    // consistency with t33: total distinct leaked grams agree
    val t33 = DedupOps.evalLeakage(srcCorpus, bench, "doc_id", "text", 3)
      .agg(org.apache.spark.sql.functions.sum("n_leaked")).as[Long].head()
    assert(out.map(_._2).sum === t33) // sources here leak disjoint grams
  }

  test("duality with d07: leaked grams exist iff d07 flags corpus docs") {
    val t33Leaked = DedupOps.evalLeakage(corpus, bench, "doc_id", "text", 3)
      .agg(org.apache.spark.sql.functions.sum("n_leaked"))
      .as[Long].head()
    val d07Rows = DedupOps
      .decontaminationCounts(corpus, bench, "doc_id", "text", 3).count()
    assert((t33Leaked > 0) === (d07Rows > 0))
    // and on a disjoint corpus both sides report clean
    val clean = Seq((20L, "nothing in common at all")).toDF("doc_id", "text")
    assert(DedupOps.evalLeakage(clean, bench, "doc_id", "text", 3)
      .agg(org.apache.spark.sql.functions.sum("n_leaked"))
      .as[Long].head() === 0L)
    assert(DedupOps
      .decontaminationCounts(clean, bench, "doc_id", "text", 3).count() === 0L)
  }
}
