package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.rng.Seed
import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Differential: PercentileOps.exactPercentiles must reproduce the built-in
  * exact `percentile` BIT-FOR-BIT (no rounding tolerance) — same bracket
  * choice, same interpolation arithmetic — across group sizes 1..n,
  * duplicate-heavy longs, continuous doubles, and edge percentiles 0/1.
  */
class PercentileOpsSpec extends AnyFunSuite with SparkSpec {

  private val ps = Seq(0.0 -> "p0", 0.25 -> "p25", 0.5 -> "p50",
    0.9 -> "p90", 0.99 -> "p99", 1.0 -> "p100")

  private def check(rows: Seq[(String, Double)], clue: String): Unit = {
    import spark.implicits._
    val df = rows.toDF("g", "v")
    val ours = PercentileOps.exactPercentiles(df, "g", "v", ps)
      .orderBy("g").collect()
    val builtin = df.groupBy(col("g"))
      .agg(ps.map { case (p, a) =>
        expr(s"percentile(v, $p)").as(a) }.head,
        ps.drop(1).map { case (p, a) => expr(s"percentile(v, $p)").as(a) }: _*)
      .orderBy("g").collect()
    assert(ours.length === builtin.length, clue)
    ours.zip(builtin).foreach { case (o: Row, b: Row) =>
      assert(o.getString(0) === b.getString(0), clue)
      ps.indices.foreach { i =>
        assert(o.getDouble(i + 1) === b.getDouble(i + 1),
          s"$clue group=${o.getString(0)} ${ps(i)._2}: " +
            s"ours=${o.getDouble(i + 1)} builtin=${b.getDouble(i + 1)}")
      }
    }
  }

  test("single-value and two-value groups") {
    check(Seq("a" -> 7.0, "b" -> 1.0, "b" -> 2.0), "tiny groups")
  }

  test("duplicate-heavy integer-valued data (histogram fast path)") {
    val rows = for (g <- Seq("x", "y"); i <- 1 to 500)
      yield (g, (i % 7).toDouble)
    check(rows, "duplicates")
  }

  test("property: matches builtin percentile on random data (multi-seed)") {
    val genRows: Gen[List[(String, Double)]] = Gen.nonEmptyListOf(for {
      g <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.oneOf(
        Gen.chooseNum(-1000L, 1000L).map(_.toDouble), // dup-prone
        Arbitrary.arbitrary[Int].map(_ / 97.0))       // continuous-ish
    } yield (g, v))
    (1 to 8).foreach { seed =>
      val rows = genRows(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(List("a" -> 0.0))
      check(rows, s"seed=$seed n=${rows.size}")
    }
  }

  test("multi-measure single-pass == per-measure builtin percentiles") {
    import spark.implicits._
    val rows = (1 to 400).map(i =>
      ("g" + (i % 3), (i % 13).toDouble, i * 1.37))
    val df = rows.toDF("g", "q", "x")
    val ours = PercentileOps.exactPercentilesMulti(df, "g", Seq(
      "q" -> Seq(0.5 -> "q50", 0.9 -> "q90"),
      "x" -> Seq(0.99 -> "x99")))
      .orderBy("g").collect()
    val builtin = df.groupBy("g").agg(
      expr("percentile(q, 0.5)").as("q50"),
      expr("percentile(q, 0.9)").as("q90"),
      expr("percentile(x, 0.99)").as("x99"))
      .orderBy("g").collect()
    ours.zip(builtin).foreach { case (o, b) =>
      (1 to 3).foreach(i => assert(o.getDouble(i) === b.getDouble(i),
        s"col $i of group ${o.getString(0)}"))
    }
  }

  test("nulls in the value column are ignored like the builtin") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", Some(5.0))).toDF("g", "v")
    val out = PercentileOps.exactPercentiles(df, "g", "v", Seq(0.5 -> "p50"))
      .orderBy("g").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      Seq(("a", 2.0), ("b", 5.0)))
  }
}
