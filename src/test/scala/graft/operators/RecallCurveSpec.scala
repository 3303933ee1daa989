package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.scalatest.funsuite.AnyFunSuite

/** s14 frontier invariants — what must hold for ANY corpus, beyond the
  * fixture values the DuckDB oracle pins: widening the probe budget can
  * only grow the candidate set, so hits and scanned totals are
  * nondecreasing in nprobe; budget 1 must agree exactly with s13's
  * single-probe evaluation (same prologue, same ranking); and hits are
  * bounded by k × nQueries.
  */
class RecallCurveSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  private lazy val curve = SparkEntry.queries("s14_recall_curve")(spark, sfDir)
    .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)

  test("one row per budget 1..4; hits bounded by k * nQueries") {
    assert(curve.map(_._1).toSeq === Seq(1, 2, 3, 4))
    curve.foreach { case (p, hits, scanned) =>
      assert(hits >= 0L && hits <= 50L, s"nprobe $p hits $hits")
      assert(scanned > 0L, s"nprobe $p scanned $scanned")
    }
  }

  test("hits and scanned are nondecreasing in the probe budget") {
    curve.sliding(2).foreach {
      case Array((pA, hA, sA), (pB, hB, sB)) =>
        assert(hA <= hB, s"hits fell $hA -> $hB from nprobe $pA to $pB")
        assert(sA <= sB, s"scanned fell $sA -> $sB from nprobe $pA to $pB")
      case _ => ()
    }
  }

  test("budget 1 agrees exactly with s13's single-probe evaluation") {
    val s13Hits = SparkEntry.queries("s13_ivf_recall")(spark, sfDir)
      .collect().map(_.getLong(1)).sum
    assert(curve.head._2 === s13Hits,
      s"curve@1 ${curve.head._2} != s13 total $s13Hits")
  }

  test("s15 k-sweep: hits monotone in k; k=5 equals s14's nprobe=2 row") {
    val ks = SparkEntry.queries("s15_recall_at_k")(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    assert(ks.map(_._1).toSeq === Seq(1, 3, 5, 10))
    ks.sliding(2).foreach {
      case Array((kA, hA), (kB, hB)) =>
        assert(hA <= hB, s"hits fell $hA -> $hB from k=$kA to k=$kB")
      case _ => ()
    }
    // same 2-probe ranking, same k=5 cut → the two eval tables must agree
    val atProbe2 = curve.find(_._1 == 2).get._2
    assert(ks.toMap.apply(5) === atProbe2,
      s"s15@k=5 ${ks.toMap.apply(5)} != s14@nprobe=2 $atProbe2")
  }
}
