package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.scalatest.funsuite.AnyFunSuite

/** Empty-document parity pin (VERDICT r5 #1): d03/d06/t08/q34 on a fixture
  * containing an EMPTY document and a WHITESPACE-ONLY document placed
  * adjacently — the exact rows where an unguarded DuckDB oracle diverges
  * (`regexp_split_to_array('', '\s+')` = [''], so empty-vs-whitespace
  * scores Jaccard **1.0** there vs the engine's 0.0, and 0/0 divisions go
  * NULL/NaN).
  *
  * The expected values below are DOUBLY pinned: they are the engine's
  * output AND DuckDB's output from the guarded oracle SQL, verified by the
  * cross-engine half of this gate (same rows, real DuckDB compare):
  *
  *   python3 tools/empty_fixture.py /tmp/efix
  *   sbt "runMain graft.Verify /tmp/efix /tmp/efix_out \
  *        d03_adjacent_jaccard d06_dedup_clusters t08_repetition q34_recursive_cte"
  *   python3 tools/check.py /tmp/efix /tmp/efix_out   # 4/4 OK
  *
  * Keep the rows here in sync with tools/empty_fixture.py.
  */
class EmptyDocParitySpec extends AnyFunSuite with SparkSpec {

  /** Mirrors tools/empty_fixture.py ROWS: (0,1) exact dup, 2 empty,
    * 3 whitespace-only (adjacent to 2 — the 0/0 pair), (4,5) Jaccard 7/9
    * (d06 edge at >=0.6, no q34 edge at >=0.85), 6 a different d06 block.
    */
  private val rows = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en", "web"),
    (1L, "the quick brown fox jumps over the lazy dog", "en", "web"),
    (2L, "", "en", "web"),
    (3L, "   ", "en", "web"),
    (4L, "alpha beta gamma delta epsilon zeta eta theta", "en", "web"),
    (5L, "alpha beta gamma delta epsilon zeta eta iota", "en", "web"),
    (6L, "uno dos tres cuatro cinco", "es", "news"))

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("efix").toString
    rows.map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(name: String) =
    SparkEntry.queries(name)(spark, fixtureDir)

  test("d03: empty-vs-whitespace pair scores 0.0, not 1.0/NULL") {
    val got = run("d03_adjacent_jaccard").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(got === Map(0L -> 1.0, 1L -> 0.0, 2L -> 0.0, 3L -> 0.0,
      4L -> 0.777778, 5L -> 0.0))
  }

  test("t08: empty and whitespace-only docs yield NULL signals") {
    val got = run("t08_repetition").collect()
    val byId = got.map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(2L, 3L); i <- 1 to 3)
      assert(byId(id).isNullAt(i), s"doc $id col $i should be NULL")
    val d0 = byId(0L)
    assert(d0.getDouble(1) === 0.111111) // 1 - 8/9 ("the" twice)
    assert(d0.getDouble(2) === 0.222222) // 2/9
    assert(d0.getDouble(3) === 0.0)
  }

  test("d06: empty docs form singleton clusters (no 0/0 edge in their block)") {
    val got = run("d06_dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // (4,5) share 7/9 tokens >= 0.6 so they MUST cluster; the empties MUST
    // NOT cluster together (the unguarded-oracle failure mode scored their
    // [''] token sets as Jaccard 1.0)
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 3L,
      4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("q34: recursion sees no empty-doc edge; only the exact dup chains") {
    val got = run("q34_recursive_cte").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 3L,
      4L -> 4L, 5L -> 5L, 6L -> 6L))
  }
}
