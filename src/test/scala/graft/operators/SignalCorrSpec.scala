package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** t35: the correlation datasheet's guard rails — zero-variance sources
  * report NULL (never an IEEE infinity), sub-bigram docs drop from the
  * join per the t23 convention, and |r| stays in [-1, 1] on a varied
  * corpus (the decimal-moment arithmetic cannot push it out).
  */
class SignalCorrSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "text", "source")

  test("zero-variance source yields NULL, not infinity") {
    // three identical docs: both signals constant -> both variances 0
    val d = docs(
      (1L, "same words again here", "dup"),
      (2L, "same words again here", "dup"),
      (3L, "same words again here", "dup"))
    val out = PipelineQueries.signalCorrelation(d, "doc_id", "text")
      .select("n_docs", "corr")
      .as[(Long, Option[Double])].head()
    assert(out === ((3L, None)))
  }

  test("sub-bigram docs drop from the join; |r| bounded on varied text") {
    val d = docs(
      (1L, "one", "mix"), // single token: no bigrams, no xent row
      (2L, "alpha beta gamma delta", "mix"),
      (3L, "gamma beta alpha", "mix"),
      (4L, "delta delta delta epsilon", "mix"),
      (5L, "!!! ??? %%% ###", "mix"))
    val out = PipelineQueries.signalCorrelation(d, "doc_id", "text")
      .select("n_docs", "corr")
      .as[(Long, Option[Double])].head()
    assert(out._1 === 4L) // doc 1 excluded
    assert(out._2.forall(r => r >= -1.0 && r <= 1.0))
  }
}
