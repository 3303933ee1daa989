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

  private def wav(samples: Seq[Int]): Array[Byte] = {
    val dataSize = 2 * samples.length
    val b = new Array[Byte](44 + dataSize)
    def ascii(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) => b(off + i) = c }
    def le32(off: Int, v: Int): Unit =
      (0 to 3).foreach(i => b(off + i) = ((v >> (8 * i)) & 0xFF).toByte)
    def le16(off: Int, v: Int): Unit =
      (0 to 1).foreach(i => b(off + i) = ((v >> (8 * i)) & 0xFF).toByte)
    ascii(0, "RIFF"); le32(4, 36 + dataSize); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
    le32(24, 8000); le32(28, 16000); le16(32, 2); le16(34, 16)
    ascii(36, "data"); le32(40, dataSize)
    samples.zipWithIndex.foreach { case (s, i) => le16(44 + 2 * i, s & 0xFFFF) }
    b
  }

  /** windows of 4 at the given constant amplitudes */
  private def clip(levels: Int*): Array[Byte] =
    wav(levels.flatMap(l => Seq.fill(4)(l)))

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
