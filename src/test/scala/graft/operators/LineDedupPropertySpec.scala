package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Line-dedup family invariants on GENERATED corpora — what must hold for
  * any input, beyond the fixture values the DuckDB oracles pin:
  *
  *  - accounting: n_lines == n_kept + n_removed per doc, and the corpus
  *    keeps exactly one instance per distinct trimmed line
  *  - collapse/stats agreement: d14's per-doc kept count == d11's
  *  - IDEMPOTENCE (the CCNet property a rollout relies on): running the
  *    dedup over the collapsed corpus removes nothing — every surviving
  *    line is already unique corpus-wide and in canonical trimmed form
  */
class LineDedupPropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.pureApply(Gen.Parameters.default, Seed(seed))

  /** Docs of 0..8 lines drawn from a SMALL pool (forcing cross-doc dups)
    * plus blanks, indentation, and repeated lines within one doc.
    */
  private def corpus(seed: Long): Seq[(Long, String)] = {
    val pool = (0 until 12).map(i => s"shared line number $i with words")
    val line = Gen.frequency(
      6 -> Gen.oneOf(pool),
      2 -> Gen.oneOf(pool).map("   " + _ + "  "), // trims to a dup
      1 -> Gen.const(""),
      1 -> Gen.const("   "))
    val doc = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, line))
      .map(_.mkString("\n"))
    sample(Gen.listOfN(80, doc), seed).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
  }

  private def docsDF(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  test("property: accounting + collapse/stats agreement + idempotence") {
    for (seed <- 1L to 8L) {
      val docs = docsDF(corpus(seed))
      val stats = DedupOps.lineDedupStats(docs, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      stats.values.foreach { case (n, k, r) => assert(n === k + r) }

      val collapsed = DedupOps.lineCollapse(docs, "doc_id", "text")
      val kept = collapsed.collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      // collapse agrees with stats doc by doc
      for ((id, (_, nk)) <- kept) assert(nk === stats(id)._2, s"doc $id")

      // exactly one survivor per distinct trimmed non-blank line
      val distinctLines = docs.select(explode(split(col("text"), "\n")).as("l"))
        .select(trim(col("l")).as("l")).filter(length(col("l")) > 0)
        .distinct().count()
      assert(kept.values.map(_._2).sum === distinctLines)

      // idempotence: dedup over the collapsed corpus removes NOTHING
      val again = DedupOps.lineDedupStats(
        collapsed.select(col("doc_id"), col("clean_text").as("text")),
        "doc_id", "text").collect()
      again.foreach { r =>
        assert(r.getLong(3) === 0L, s"doc ${r.getLong(0)} re-removed lines")
      }
      // and collapse over the collapsed corpus is the identity
      val twice = DedupOps.lineCollapse(
        collapsed.select(col("doc_id"), col("clean_text").as("text")),
        "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      for ((id, (text, _)) <- kept) assert(twice(id) === text, s"doc $id")
    }
  }
}
