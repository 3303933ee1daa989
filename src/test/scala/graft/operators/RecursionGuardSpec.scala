package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.scalatest.funsuite.AnyFunSuite

/** q34's recursion depth guard (VERDICT r5 #4): WITH RECURSIVE must be
  * BOUNDED — a pathological fixture (one near-dup chain longer than any
  * plausible run) has to fail fast with the level-limit error, the SQL
  * twin of d06's `require(converged, maxIter)`, never run away silently.
  * Pins both sides of `spark.sql.cteRecursionLevelLimit` on a 500-long
  * chain: the mechanism completes when the limit clears the chain, errors
  * when it doesn't, and the q34 registry entry enforces its documented
  * bound regardless of ambient session state.
  */
class RecursionGuardSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val LimitKey = "spark.sql.cteRecursionLevelLimit"

  private def withLimit[T](v: String)(body: => T): T = {
    val prev = spark.conf.get(LimitKey)
    spark.conf.set(LimitKey, v)
    try body finally spark.conf.set(LimitKey, prev)
  }

  /** 0→1→…→500: each step is one recursion level past the anchor. */
  private val chain500 =
    """WITH RECURSIVE r(n) AS (
      |  SELECT 0 UNION ALL SELECT n + 1 FROM r WHERE n < 500)
      |SELECT count(*) AS c FROM r""".stripMargin

  test("level limit above the chain: a 500-long chain completes") {
    withLimit("600") {
      assert(spark.sql(chain500).collect()(0).getLong(0) === 501L)
    }
  }

  test("level limit below the chain: fails fast with the limit error") {
    withLimit("100") {
      val e = intercept[Exception] { spark.sql(chain500).collect() }
      assert(e.getMessage.toLowerCase.contains("recursion"),
        s"expected the recursion-limit error, got: ${e.getMessage}")
    }
  }

  test("q34 pins its own documented bound and fails fast on a 501-dup chain") {
    // 501 identical docs: every adjacent pair is an edge, one chain of
    // depth 501 > Q34LevelLimit — the pathological-fixture scenario.
    val dir = java.nio.file.Files.createTempDirectory("rgfix").toString
    (0 until 501).map(i =>
        (i.toLong, "same text in every single document here", "en", "web", 38L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // ambient limit high: q34 must still enforce ITS bound, not inherit
    withLimit("10000") {
      val e = intercept[Exception] {
        SparkEntry.queries("q34_recursive_cte")(spark, dir).collect()
      }
      assert(e.getMessage.toLowerCase.contains("recursion"),
        s"expected the recursion-limit error, got: ${e.getMessage}")
      // no ambient leak (ADVICE r6): the pin lives in q34's isolated child
      // session; the caller's conf must still read the ambient value
      assert(spark.conf.get(LimitKey) === "10000")
    }
  }

  test("q34 completes on realistic chains under its bound") {
    // 40 docs in 20 exact-dup pairs: chains of length 2, depth well under
    // the bound — the registry path stays green with the guard in place.
    val dir = java.nio.file.Files.createTempDirectory("rgfix2").toString
    (0 until 40).map { i =>
      val t = s"pair ${i / 2} shared text body for the near dup chain"
      (i.toLong, t, "en", "web", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q34_recursive_cte")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 40)
    for (i <- 0 until 40) assert(got(i.toLong) === (i - i % 2).toLong)
  }
}
