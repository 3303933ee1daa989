package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** m11: the full-series verify semantics the 32-bit print cannot give —
  * two clips sharing ALL 32 print bits but diverging later must NOT
  * cluster; a pair within full-series Hamming ≤ 3 must; copies cluster on
  * the min id; clips with fewer than minBits deltas stay singletons even
  * when byte-identical (no signal, no dup claim). The banding and CC
  * pieces carry their own specs; this pins their composition plus the
  * fa/fb split.
  */
class AudioClustersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import Multimodal.MediaRow

  import graft.MediaTestBytes.{clip, rising, diverges, oneDip}

  test("print-equal but series-divergent clips do NOT cluster; radius-1 pair does") {
    val media = Seq(
      MediaRow(1L, "audio", clip(rising)),
      MediaRow(2L, "audio", clip(diverges)),
      MediaRow(3L, "audio", clip(oneDip)),
      MediaRow(4L, "audio", clip(rising)), // exact copy of 1
      MediaRow(9L, "junk", "not audio".getBytes("US-ASCII"))).toDS()
    val out = Multimodal.audioClusters(media, windowFrames = 4)
      .orderBy("media_id")
      .select("media_id", "cluster_id", "is_canonical")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, true), (2L, 2L, true), (3L, 1L, false), (4L, 1L, false)))
  }

  test("clips below minBits stay singletons even when byte-identical") {
    val short = clip(Seq(10, 300, 200, 500, 400)) // 5 windows -> 4 bits < 8
    val media = Seq(
      MediaRow(1L, "audio", short), MediaRow(2L, "audio", short)).toDS()
    val out = Multimodal.audioClusters(media, windowFrames = 4)
      .orderBy("media_id")
      .select("media_id", "cluster_id").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L), (2L, 2L)))
    // ...but an explicit lower bound admits them
    val loose = Multimodal.audioClusters(media, windowFrames = 4, minBits = 4)
      .select("cluster_id").as[Long].collect().toSeq
    assert(loose === Seq(1L, 1L))
  }

  test("different-length clips never pair, even with matching print prefix") {
    val media = Seq(
      MediaRow(1L, "audio", clip(rising)),
      MediaRow(2L, "audio", clip(rising :+ 4100))).toDS() // 41 windows
    val out = Multimodal.audioClusters(media, windowFrames = 4)
      .select("cluster_id").as[Long].collect().toSeq.sorted
    assert(out === Seq(1L, 2L))
  }

  test("pigeonhole property: every same-length pair within full-series " +
    "Hamming 3 lands in one cluster (no probabilistic miss)") {
    import graft.functions.MediaCodecs
    // 40 equal-length LCG clips at 9 delta bits: ~25% of pairs fall
    // within radius 3, so the recall claim is exercised densely
    val media = (1L to 40L)
      .map(i => Multimodal.MediaRow(i, "audio",
        MediaCodecs.buildWav(8000, 50, i * 7 + 3)))
      .toDS()
    val bits = Multimodal.audioFullBits(media, windowFrames = 5)
      .collect().map(b => b.media_id -> ((b.fa, b.fb))).toMap
    val clusters = Multimodal.audioClusters(media, windowFrames = 5)
      .select("media_id", "cluster_id").as[(Long, Long)].collect().toMap
    val within = for {
      a <- 1L to 40L; b <- (a + 1) to 40L
      ham = java.lang.Long.bitCount(bits(a)._1 ^ bits(b)._1) +
        java.lang.Long.bitCount(bits(a)._2 ^ bits(b)._2)
      if ham <= 3
    } yield (a, b)
    assert(within.nonEmpty, "vacuous fixture: no pair within radius 3")
    for ((a, b) <- within)
      assert(clusters(a) === clusters(b),
        s"pair ($a, $b) within radius 3 split across clusters")
  }

  test("fa matches the m10 print; fb carries the post-32 deltas") {
    val bits = Multimodal.audioFullBits(
      Seq(MediaRow(1L, "audio", clip(rising))).toDS(), windowFrames = 4).head()
    val fp = Multimodal.audioFingerprint(
      Seq(MediaRow(1L, "audio", clip(rising))).toDS(), windowFrames = 4).head()
    assert(bits.fa === fp.fp)
    assert(bits.n_bits === 39)
    assert(bits.fb === 0x7FL)
  }
}
