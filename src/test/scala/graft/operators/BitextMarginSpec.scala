package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** s39: the ratio-margin bitext miner beyond the fixture values the
  * DuckDB oracle pins — a full plain-Scala reimplementation of the
  * criterion (micro-unit cosines, per-side top-k integer sums, one
  * double division, mutual argmax) differentially checked against the
  * Spark operator on a structured fixture, plus the structural
  * guarantees mining downstreams rely on: the output is a partial
  * MATCHING (each id on each side at most once — the hub filter), and
  * degenerate sides behave (empty side → empty output; k past the side
  * size divides by the actual neighborhood count, not k).
  */
class BitextMarginSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  /** Deterministic structured fixture: three tight clusters plus a hub
    * that sits near two of them — the shape margin mining exists for. */
  private def fixture(n: Int, dim: Int, shift: Double): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      val c = i % 3
      val v = (0 until dim).map { d =>
        (math.sin(c * 2.1 + d * 0.7 + shift) +
          0.15 * math.cos(i * 1.3 + d * 0.31)).toFloat
      }
      (i.toLong, v)
    }

  /** s40/s42's candidate filter re-derived in plain Scala: sign
    * signature over the first `sigDim` coordinates, 2 bands of
    * sigDim/2 bits, pairs sharing any band key. */
  private def bandedPair(sigDim: Int)(a: Seq[Float], b: Seq[Float]): Boolean = {
    val bits = sigDim / 2
    val mask = (1L << bits) - 1
    def sig(v: Seq[Float]): Long =
      (0 until sigDim).map(i => if (v(i) > 0f) 1L << i else 0L).sum
    val (sa, sb) = (sig(a), sig(b))
    (0 until 2).exists(i => ((sa >> (i * bits)) & mask) == ((sb >> (i * bits)) & mask))
  }

  /** The miner re-derived in plain Scala — same micro rounding, same
    * integer neighborhood sums, same single double division, same
    * (margin desc, id asc) mutual argmax. `candidate` restricts the
    * scored universe (s40's band filter; s39 scores everything). */
  private def reference(left: Seq[(Long, Seq[Float])],
      right: Seq[(Long, Seq[Float])], k: Int,
      candidate: (Seq[Float], Seq[Float]) => Boolean =
        (_, _) => true): Set[(Long, Long)] = {
    def simMicro(a: Seq[Float], b: Seq[Float]): Long = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      val na = math.sqrt(ad.zip(ad).foldLeft(0.0) { case (s, (x, y)) => s + x * y })
      val nb = math.sqrt(bd.zip(bd).foldLeft(0.0) { case (s, (x, y)) => s + x * y })
      val c = if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
      // Spark round() is HALF_UP via BigDecimal — rint would be half-even
      BigDecimal(c * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val sims = for ((il, lv) <- left; (ir, rv) <- right
        if candidate(lv, rv))
      yield (il, ir, simMicro(lv, rv))
    def topk(byKey: Map[Long, Seq[(Long, Long)]]): Map[Long, Seq[(Long, Long)]] =
      byKey.map { case (id, xs) =>
        id -> xs.sortBy { case (o, s) => (-s, o) }.take(k)
      }
    val fwd = topk(sims.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map(t => (t._2, t._3)).toSeq })
    val bwd = topk(sims.groupBy(_._2).map { case (id, xs) =>
      id -> xs.map(t => (t._1, t._3)).toSeq })
    val cand = (fwd.toSeq.flatMap { case (il, xs) =>
      xs.map { case (ir, s) => (il, ir, s) } } ++
      bwd.toSeq.flatMap { case (ir, xs) =>
        xs.map { case (il, s) => (il, ir, s) } }).distinct
    val sumL = fwd.map { case (id, xs) => id -> (xs.map(_._2).sum, xs.size.toLong) }
    val sumR = bwd.map { case (id, xs) => id -> (xs.map(_._2).sum, xs.size.toLong) }
    val margins = cand.flatMap { case (il, ir, s) =>
      val (sl, cl) = sumL(il); val (sr, cr) = sumR(ir)
      val den = sl * cr + sr * cl
      if (den == 0L) None
      else Some((il, ir, 2.0 * s * cl * cr / den))
    }
    def best[A](xs: Seq[(Long, Long, Double)], key: ((Long, Long, Double)) => Long,
        other: ((Long, Long, Double)) => Long): Set[(Long, Long)] =
      xs.groupBy(key).values.map { g =>
        val b = g.minBy(t => (-t._3, other(t)))
        (b._1, b._2)
      }.toSet
    best(margins, _._1, _._2) intersect best(margins, _._2, _._1)
  }

  test("differential: Spark miner == plain-Scala criterion on the cluster+hub fixture") {
    val left = fixture(14, 8, 0.0)
    val right = fixture(11, 8, 0.05).map { case (id, v) => (id + 100L, v) }
    val got = SimilarityOps.bitextMarginMine(df(left), df(right), 3)
      .select("id_l", "id_r").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = reference(left, right, 3)
    assert(got === want)
    assert(got.nonEmpty) // the fixture must exercise the criterion
  }

  test("banded differential: Spark banded miner == plain-Scala criterion with the band filter") {
    // dim 20 ≥ sigDim 16 — the banded rung's assumption
    val left = fixture(16, 20, 0.0)
    val right = fixture(13, 20, 0.04).map { case (id, v) => (id + 200L, v) }
    val got = SimilarityOps.bitextMarginMineBanded(df(left), df(right), 3,
        sigDim = 16, bands = 2)
      .select("id_l", "id_r").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = reference(left, right, 3, bandedPair(16))
    assert(got === want)
    assert(got.nonEmpty)
    // the fixture must actually exercise the band PRUNE (some cross
    // pair fails every band) or the differential proves nothing
    assert(left.exists { case (_, lv) =>
      right.exists { case (_, rv) => !bandedPair(16)(lv, rv) } })
  }

  test("wide-dial differential (s42): 32-bit signature, 2x16-bit bands") {
    val left = fixture(16, 36, 0.0)
    val right = fixture(13, 36, 0.04).map { case (id, v) => (id + 200L, v) }
    val got = SimilarityOps.bitextMarginMineBanded(df(left), df(right), 3,
        sigDim = 32, bands = 2)
      .select("id_l", "id_r").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === reference(left, right, 3, bandedPair(32)))
    assert(got.nonEmpty)
    // 16-bit keys must prune at least as hard as 8-bit keys pair-wise:
    // a 32-bit band agreement implies both 16-bit halves of that slice
    // agree only when slices align — assert the prune is non-trivial
    // and the wide candidate set is a subset of... (slices do NOT nest
    // across sigDims here, unlike the chunk geometries: the wide sig
    // covers MORE coordinates) — so pin only non-triviality
    assert(left.exists { case (_, lv) =>
      right.exists { case (_, rv) => !bandedPair(32)(lv, rv) } })
  }

  test("output is a partial matching: each id at most once per side") {
    val left = fixture(12, 6, 0.3)
    val right = fixture(12, 6, 0.31).map { case (id, v) => (id + 50L, v) }
    val rows = SimilarityOps.bitextMarginMine(df(left), df(right), 4)
      .select("id_l", "id_r").collect()
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    assert(rows.map(_.getLong(1)).distinct.length === rows.length)
  }

  test("degenerate sides: empty right is empty; k past side size uses actual counts") {
    val left = fixture(4, 4, 0.0)
    assert(SimilarityOps.bitextMarginMine(df(left),
      df(Seq.empty[(Long, Seq[Float])]), 2).count() === 0L)
    // k = 10 over a 3-vector right side: neighborhood sums divide by the
    // actual count — agreement with the reference pins it
    val right = fixture(3, 4, 0.2).map { case (id, v) => (id + 9L, v) }
    val got = SimilarityOps.bitextMarginMine(df(left), df(right), 10)
      .select("id_l", "id_r").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === reference(left, right, 10))
  }
}
