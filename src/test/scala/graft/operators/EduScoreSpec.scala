package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** t34: closed-form score values on a hand-computed fixture (every term
  * derivable by hand from the t02 feature definitions), the >= boundary
  * semantics of both thresholds, and the empty-document zero score.
  */
class EduScoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.map { case (i, t) => (i, t, "web") }
      .toDF("doc_id", "text", "source")

  // "abcd efgh": len 9, alpha 8/9, space 1/9, 2 tokens, mean_token_len 4
  // score = round(0.888889*4e6) + round(0.111111*2e6)
  //       - round(4*250000) + round(ln(3)*500000)
  //       = 3555556 + 222222 - 1000000 + 549306 = 3327084
  private val expected = 3327084L

  test("closed-form score and bucket boundaries") {
    val d = docs(1L -> "abcd efgh")
    def bucketAt(hi: Long, mid: Long): String =
      PipelineQueries.eduScore(d, "doc_id", "text", hi, mid)
        .select("edu_bucket").as[String].head()
    val score = PipelineQueries
      .eduScore(d, "doc_id", "text", 1L, 0L)
      .select("score_micro").as[Long].head()
    assert(score === expected)
    // >= on both thresholds: equality lands in the upper bucket
    assert(bucketAt(expected, 0L) === "high")
    assert(bucketAt(expected + 1, expected) === "medium")
    assert(bucketAt(expected + 2, expected + 1) === "low")
  }

  test("empty and whitespace docs score zero, never null") {
    val out = PipelineQueries
      .eduScore(docs(1L -> "", 2L -> "   "), "doc_id", "text",
        4630000L, 4370000L)
      .orderBy("doc_id")
      .select("score_micro", "edu_bucket")
      .as[(Long, String)].collect().toSeq
    // "   ": space_ratio 1 -> 2e6; mean_token_len 0; ln(1+0)=0
    assert(out === Seq((0L, "low"), (2000000L, "low")))
  }
}
