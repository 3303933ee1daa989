package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.scalatest.funsuite.AnyFunSuite

/** t17_gopher_rules rule-isolation pin: one fixture doc per Gopher rule,
  * each violating EXACTLY that rule (every other gate passes), plus one
  * doc passing all nine. Fixture text is built arithmetically from
  * repeated known tokens so every expected count is exact by
  * construction, not re-derived from the engine.
  *
  * The keep bit itself is [[PipelineQueries.GopherKeepSql]] — the same
  * string the DuckDB oracle interpolates — so this spec pins the Spark
  * `expr` half and the cross-engine gate (sf0.01 + the three fixture
  * gates, see StructuredTextParitySpec's header recipe) pins the other.
  */
class GopherRulesSpec extends AnyFunSuite with SparkSpec {

  // "the data and model " tokens: the=stopword, all alpha, 3+4+3+5 chars.
  private val quad = "the data and model "

  private val rows = Seq(
    // A: 60 words, 225 chars, mean 3.75, 30 stopwords, all alpha → keep
    (0L, quad * 15),
    // B: 4 words < 50 — word-count rule only
    (1L, "the and of data"),
    // C: 52 words, 606 chars → mean > 10 — word-length rule only
    (2L, ("abcdefghijkl " * 50) + "the the"),
    // D: 10/10 bullet lines (> 9/10) — bullet rule only; "-" tokens are
    //    non-alpha but 80/90 alpha still clears 4/5
    (3L, Array.fill(10)("- " + quad * 2).mkString("\n")),
    // E: 60 words + 7 '#' tokens → 10·7 > 67 — symbol rule only
    (4L, quad * 15 + Array.fill(7)("#").mkString(" ")),
    // F: 2 alpha of 60 words (< 4/5) — alpha rule only; 180 chars sits
    //    exactly on the 3·n_words lower bound (boundary must pass)
    (5L, "the and " + "123 " * 58),
    // G: 4/10 lines end "..." (> 3/10) — ellipsis rule only ("..." is
    //    deliberately not "…" so n_sym stays 0)
    (6L, (0 until 10).map(i => (quad * 2).trim + (if (i < 4) "..." else ""))
      .mkString("\n")),
    // H: 60 words, zero stopwords — stopword rule only
    (7L, "data model quick train " * 15),
    // I: empty doc — n_words = 0 path and the n_lines = 0 guards
    (8L, ""))

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gfix").toString
    rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private lazy val byId =
    SparkEntry.queries("t17_gopher_rules")(spark, fixtureDir)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("doc A passes every rule, with all nine counts pinned exactly") {
    val r = byId(0L)
    assert((1 to 8).map(r.getLong) ===
      Seq(60L, 225L, 1L, 0L, 0L, 30L, 60L, 0L))
    assert(r.getBoolean(9))
  }

  test("each rule-violating doc fails, and ONLY the targeted rule fails") {
    // (doc, the one count that trips, a predicate proving it trips)
    val cases = Seq[(Long, String, org.apache.spark.sql.Row => Boolean)](
      (1L, "n_words", r => r.getLong(1) < 50),
      (2L, "word-length", r => r.getLong(2) > 10 * r.getLong(1)),
      (3L, "bullet", r => 10 * r.getLong(4) > 9 * r.getLong(3)),
      (4L, "symbol", r => 10 * r.getLong(8) > r.getLong(1)),
      (5L, "alpha", r => 5 * r.getLong(7) < 4 * r.getLong(1)),
      (6L, "ellipsis", r => 10 * r.getLong(5) > 3 * r.getLong(3)),
      (7L, "stopword", r => r.getLong(6) < 2))
    for ((id, label, trips) <- cases) {
      val r = byId(id)
      assert(!r.getBoolean(9), s"doc $id should be dropped ($label)")
      assert(trips(r), s"doc $id: the $label count should be the trigger")
      // every OTHER rule passes — flipping just the tripped comparison
      // would flip keep; verified by checking the full conjunction with
      // the targeted rule's operands removed
      val others = cases.filterNot(_._1 == id).forall { case (_, _, t) => !t(r) }
      assert(others, s"doc $id trips a rule other than $label")
      if (label != "n_words") assert(r.getLong(1) >= 50, s"doc $id word floor")
    }
  }

  test("t18 attributes each doc to its one violated rule (or 'keep')") {
    val got = SparkEntry.queries("t18_gopher_reasons")(spark, fixtureDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // docs 1 and 8 both fail ONLY too_few_words; every other violator
    // fails exactly its targeted rule, so first-failing = only-failing
    assert(got === Map(
      "keep" -> 1L, "too_few_words" -> 2L, "long_words" -> 1L,
      "bullet_heavy" -> 1L, "symbol_heavy" -> 1L, "low_alpha" -> 1L,
      "ellipsis_heavy" -> 1L, "few_stopwords" -> 1L))
  }

  test("t19 funnel over the fixture: 9 raw → 6 quality → 1 gopher → " +
    "1 canonical") {
    // quality (t02): docs 1 (len 15 < 20), 5 (alpha 6/240 < 0.5), and 8
    // (empty) fail; gopher: only doc A survives; all texts distinct, so
    // the dedup stage keeps the sole survivor as its own canonical
    val got = SparkEntry.queries("t19_filter_funnel")(spark, fixtureDir)
      .collect()
    assert(got.length === 1) // single-source fixture
    val r = got(0)
    assert(r.getString(0) === "web")
    assert((1 to 4).map(r.getLong) === Seq(9L, 6L, 1L, 1L))
  }

  test("empty doc yields zero counts and is dropped without error") {
    val r = byId(8L)
    assert((1 to 8).map(r.getLong).forall(_ == 0L))
    assert(!r.getBoolean(9))
  }
}
