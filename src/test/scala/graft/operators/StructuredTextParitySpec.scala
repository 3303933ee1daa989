package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.scalatest.funsuite.AnyFunSuite

/** Structured-text parity pin (VERDICT r6 #1/#2): the line-dedup (d11/d12)
  * and PII (t14/t15) operators on docs with the structure the driver's
  * synthetic text lacks — newlines, shared boilerplate lines, blank and
  * whitespace-only lines, leading indentation, emails / phones / IPv4s /
  * long digit runs, and empty docs.
  *
  * The expected values below are hand-computed from the operator
  * definitions AND independently confirmed by DuckDB through the
  * cross-engine half of this gate (same shapes, real oracle compare):
  *
  *   python3 tools/structured_text_fixture.py /tmp/sfix
  *   sbt "runMain graft.Verify /tmp/sfix /tmp/sfix_out \
  *        d11_line_dedup d12_boilerplate_lines d13_paragraph_dedup \
  *        d14_dedup_collapse t14_pii_counts t15_pii_redact t16_redact_rescore \
  *        d01_exact_dedup t01_token_stats t08_repetition t12_source_mix"
  *   python3 tools/check.py /tmp/sfix /tmp/sfix_out   # 11/11 OK
  *
  * (That fixture run is also what exposed — and now guards — the latent
  * t01 n_subwords oracle divergence on newline-bearing text: the engine
  * counts every non-alnum non-SPACE char, the old oracle stripped all
  * `\s`.)
  */
class StructuredTextParitySpec extends AnyFunSuite with SparkSpec {

  /** Boilerplate "All rights reserved." recurs in docs 0/1/2/5 (doc 5 with
    * leading+trailing spaces — the trim canonicalization case); docs 3/4
    * have no non-blank line; doc 2 holds blank and whitespace-only lines.
    */
  private val rows = Seq(
    (0L, "Welcome to the crawl report.\nAll rights reserved.\n" +
      "Contact support@example.com or call 555-123-4567."),
    (1L, "All rights reserved.\nFresh unique content line one."),
    (2L, "All rights reserved.\n\n   \nServer 10.0.0.254 answered."),
    (3L, ""),
    (4L, "   \n  "),
    (5L, "  All rights reserved.  "),
    (6L, "Invoice 123456789 settled for account 98765432."))

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sfix").toString
    rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, fixtureDir)

  test("d11: corpus-wide first occurrence wins; trim canonicalizes; " +
    "blank-only docs report zeros") {
    val got = run("d11_line_dedup").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      0L -> ((3L, 3L, 0L)), // all three lines first occurrences
      1L -> ((2L, 1L, 1L)), // boilerplate removed, unique line kept
      2L -> ((2L, 1L, 1L)), // blank + whitespace lines not counted at all
      3L -> ((0L, 0L, 0L)), // empty doc
      4L -> ((0L, 0L, 0L)), // whitespace-only lines doc
      5L -> ((1L, 0L, 1L)), // "  All rights reserved.  " trims to the dup
      6L -> ((1L, 1L, 0L))))
    // conservation: kept == number of distinct trimmed lines in the corpus
    assert(got.values.map(_._2).sum === 6L)
    assert(got.values.forall { case (n, k, r) => n == k + r })
  }

  test("d12: the shared boilerplate line is the only >=2-doc line") {
    val got = run("d12_boilerplate_lines").collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getString(1) === "All rights reserved.")
    assert(r.getLong(2) === 4L) // docs 0, 1, 2, 5
    assert(r.getLong(3) === 4L)
  }

  test("t14: per-class counts are non-degenerate and class-disjoint") {
    val got = run("t14_pii_counts").collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))))
      .toMap
    assert(got === Map(
      0L -> ((1, 0, 1, 0)), // email + dashed phone; no 8+ digit run
      1L -> ((0, 0, 0, 0)),
      2L -> ((0, 1, 0, 0)), // IPv4 is NOT a phone (3-group shape fails)
      3L -> ((0, 0, 0, 0)),
      4L -> ((0, 0, 0, 0)),
      5L -> ((0, 0, 0, 0)),
      6L -> ((0, 0, 0, 2)))) // two id runs; no separators → no phone
  }

  test("d14: collapse rebuilds docs from kept lines in canonical form") {
    val got = run("d14_dedup_collapse").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(0L)._1 === rows(0)._2) // all lines first occurrences → intact
    assert(got(1L)._1 === "Fresh unique content line one.") // dup dropped
    assert(got(2L)._1 === "Server 10.0.0.254 answered.") // dup+blanks gone
    assert(got(3L) === (("", 0L))) // empty doc
    assert(got(4L) === (("", 0L))) // whitespace-only doc
    assert(got(5L) === (("", 0L))) // its one line is a dup → nothing kept
    assert(got(6L)._1 === rows(6)._2)
    // kept counts agree with d11's accounting
    val stats = run("d11_line_dedup").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    for ((id, (_, nk)) <- got) assert(nk === stats(id), s"doc $id")
  }

  test("t15: sequential class-tagged redaction, text pinned exactly") {
    val got = run("t15_pii_redact").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getString(2) ===
      "Welcome to the crawl report.\nAll rights reserved.\n" +
        "Contact <EMAIL> or call <PHONE>.")
    assert(got(2L).getString(2) ===
      "All rights reserved.\n\n   \nServer <IP> answered.")
    assert(got(6L).getString(2) ===
      "Invoice <ID> settled for account <ID>.")
    assert(got(1L).getString(2) === rows(1)._2) // no PII → identity
    for ((id, r) <- got) {
      assert(r.getInt(1) === rows(id.toInt)._2.length, s"raw len doc $id")
      assert(r.getInt(3) === r.getString(2).length, s"clean len doc $id")
    }
  }
}
