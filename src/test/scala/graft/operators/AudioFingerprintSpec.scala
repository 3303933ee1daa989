package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** m10: bit order and cap over hand-authored constant-amplitude windows
  * (every delta sign a closed form), copy invariance (the dedup property
  * the fingerprint exists for), and the single-window zero row.
  */
class AudioFingerprintSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import Multimodal.MediaRow

  /** windows of 4 at the given constant amplitudes (shared bytes) */
  private def clip(levels: Int*): Array[Byte] =
    graft.MediaTestBytes.clip(levels)

  test("LSB-first bit order and copy invariance") {
    // windows 10, 300, 200, 500: deltas up, down, up -> bits 1,0,1 = 5
    val a = clip(10, 300, 200, 500)
    val media = Seq(
      MediaRow(1L, "audio", a),
      MediaRow(7L, "audio", a), // identical payload, new id
      MediaRow(2L, "audio", clip(100))).toDS()
    val out = Multimodal.audioFingerprint(media, windowFrames = 4)
      .collect().map(r => r.media_id -> ((r.n_windows, r.n_bits, r.fp)))
      .toMap
    assert(out(1L) === ((4, 3, 5L)))
    assert(out(7L) === out(1L)) // the dedup property
    assert(out(2L) === ((1, 0, 0L))) // single window: nothing to delta
  }

  test("fingerprint caps at 32 bits for long clips") {
    // 40 windows strictly rising: 39 deltas all 1, capped to 32 ones
    val a = clip((1 to 40).map(_ * 100): _*)
    val out = Multimodal.audioFingerprint(
      Seq(MediaRow(1L, "audio", a)).toDS(), windowFrames = 4).head()
    assert(out.n_windows === 40)
    assert(out.n_bits === 32)
    assert(out.fp === 0xFFFFFFFFL)
  }
}
