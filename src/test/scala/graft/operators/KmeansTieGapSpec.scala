package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** s12's cross-engine determinism rests on every assignment being decided
  * by a similarity GAP no ulp-level difference can flip: exact ties break
  * consistently by centroid_id, but a near-tie within ~1 ulp could assign
  * a vector differently under another engine's dot-product summation
  * order (ADVICE r5; the t11 round-half-lottery class). Pin the margin on
  * the oracle fixture for BOTH Lloyd rounds: if a regenerated fixture
  * ever introduces a coin-flip assignment, this fails loudly instead of
  * flaking the driver gate.
  */
class KmeansTieGapSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  /** Min over vectors of the smallest gap between CONSECUTIVE ranks
    * 1..depth of cosine similarity against the centroid table. depth=2
    * guards the assignment (argmax); depth=5 guards every probe-rank
    * boundary the s08/s14/s15 multiprobe sweep cuts at (nprobe 1..4
    * keeps the top 1..4 centroids, so ranks up to 5 border a decision) —
    * ADVICE r7: a near-tie at probe rank 2..4 could flip a candidate set
    * cross-engine just like an assignment tie. Exact-tie rows (gap 0)
    * are INCLUDED and must fail the pin: a tie this engine breaks by
    * centroid_id is precisely the ordering another engine's summation
    * order could flip (review r6).
    */
  private def minRankGap(corpus: DataFrame, centroids: DataFrame,
      depth: Int): Double = {
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val c = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val k = centroids.select(col("vec_id").as("cid"),
      col("embedding").cast("array<double>").as("cv"))
    val sims = c.crossJoin(broadcast(k))
      .withColumn("sim", dot(col("v"), col("cv")) /
        (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("cv"), col("cv")))))
    // NO gap-0 exclusion: an exact tie in THIS engine is precisely the
    // case another engine's summation order could resolve a ulp apart the
    // other way — zeros must fail the pin, not slip past it (review r6)
    sims.groupBy(col("vec_id"))
      .agg(sort_array(collect_list(col("sim")), asc = false).as("s"))
      .select(explode(sequence(lit(1), lit(depth - 1))).as("r"), col("s"))
      .select((element_at(col("s"), col("r")) -
        element_at(col("s"), col("r") + 1)).as("gap"))
      .agg(min(col("gap"))).collect()(0).getDouble(0)
  }

  test("no near-tie assignments on the s12 fixture, either round") {
    val emb = Tables.embeddings(spark, sfDir)
    val init = emb.filter(col("vec_id") < 8)
    val gap1 = minRankGap(emb, init, depth = 2)
    assert(gap1 > 1e-12, s"round-1 min top-2 similarity gap $gap1")
    // round-2 centroids exactly as kmeansTrain builds them (4dp means)
    val cent2 = SimilarityOps.centroidRebuild(
      SimilarityOps.centroidRefine(emb, init))
    val gap2 = minRankGap(emb, cent2, depth = 2)
    assert(gap2 > 1e-12, s"round-2 min top-2 similarity gap $gap2")
  }

  test("no near-tie at any probe-rank boundary the multiprobe sweep cuts") {
    // s08/s14/s15 keep the top-nprobe centroids per QUERY vector for
    // nprobe in 1..4 against the init centroid table; every consecutive
    // rank pair through 5 borders one of those candidate-set decisions.
    // Guard ALL corpus vectors (superset of the query subsets), so a
    // regenerated fixture introducing a probe-rank coin flip fails here
    // loudly instead of flaking the driver gate.
    val emb = Tables.embeddings(spark, sfDir)
    val init = emb.filter(col("vec_id") < 8)
    val gap = minRankGap(emb, init, depth = 5)
    assert(gap > 1e-12, s"min probe-rank (1..5) similarity gap $gap")
  }
}
