package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** m08: silence-trim plans over hand-authored WAV bytes with EXACT known
  * sample values (constant-amplitude windows make every milli-mean a
  * closed form), pinning the edge-only trim rule — interior quiet
  * windows stay — the all-silent NULL plan, the partial last window's
  * sample accounting, and the poison row, independently of the builder
  * pattern the sf-data oracle re-derives.
  */
class SilenceTrimSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import Multimodal.MediaRow

  /** Minimal 16-bit mono PCM WAV (independent of MediaCodecs.buildWav). */
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

  test("edge-only trim, interior quiet kept, partial window accounting") {
    // windowFrames = 4: w0 silent, w1 loud, w2 silent (INTERIOR - stays),
    // w3 loud, w4 = 2-sample partial, silent
    val samples =
      Seq.fill(4)(0) ++ Seq.fill(4)(10000) ++ Seq.fill(4)(0) ++
        Seq.fill(4)(10000) ++ Seq.fill(2)(0)
    val media = Seq(
      MediaRow(1L, "audio", wav(samples)),
      MediaRow(2L, "audio", wav(Seq.fill(6)(3))), // all silent, 2 windows
      MediaRow(3L, "audio", "junk".getBytes("US-ASCII"))).toDS()
    val out = Multimodal.silenceTrim(media, windowFrames = 4,
      silMilli = 1000000L).toDF()
      .orderBy("media_id")
      .select("media_id", "n_windows", "n_active", "first_active",
        "last_active", "start_frame", "kept_frames")
      .as[(Long, Int, Int, Option[Int], Option[Int], Option[Long],
        Option[Long])].collect().toSeq
    assert(out === Seq(
      // kept = windows 1..3 = 12 samples; the silent w2 is interior
      (1L, 5, 2, Some(1), Some(3), Some(4L), Some(12L)),
      (2L, 2, 0, None, None, None, None)))
  }

  test("fully-active clip keeps every sample including the partial tail") {
    val media = Seq(MediaRow(4L, "audio", wav(Seq.fill(10)(5000)))).toDS()
    val out = Multimodal.silenceTrim(media, windowFrames = 4,
      silMilli = 1000000L).toDF()
      .select("n_windows", "n_active", "first_active", "last_active",
        "kept_frames")
      .as[(Int, Int, Option[Int], Option[Int], Option[Long])].head()
    assert(out === ((3, 3, Some(0), Some(2), Some(10L))))
  }
}
