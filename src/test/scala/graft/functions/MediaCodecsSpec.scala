package graft.functions

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Pins the pure-JVM container parsers against bytes written by an
  * INDEPENDENT implementation: tools/media_fixture.py builds every file
  * under src/test/resources/media/ with Python struct.pack (including
  * variants the Scala builders never emit — top-down/32bpp/palette BMPs,
  * stereo/LIST-chunk/odd-chunk WAVs, C444/Cmono/frame-param Y4M), and
  * manifest.json records what a correct parser must extract. The same
  * cross-implementation recipe as P19's murmur3 vectors: a compensating
  * builder/parser bug cannot pass a second implementation's bytes.
  */
class MediaCodecsSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    assert(in != null, s"missing test resource $name (run tools/media_fixture.py)")
    try in.readAllBytes() finally in.close()
  }

  test("python-written fixtures parse to exactly the manifest metadata") {
    val cases = new ObjectMapper().readTree(resource("/media/manifest.json"))
    assert(cases.size() >= 20)
    cases.elements().asScala.foreach { c =>
      val file = c.get("file").asText()
      val bytes = resource(s"/media/$file")
      val expect = c.get("expect")
      if (expect.isNull) {
        assert(MediaCodecs.parseBmp(bytes).isEmpty, s"$file must not parse as bmp")
        assert(MediaCodecs.parseWav(bytes).isEmpty, s"$file must not parse as wav")
        assert(MediaCodecs.parseY4m(bytes).isEmpty, s"$file must not parse as y4m")
      } else expect.get("format").asText() match {
        case "bmp" =>
          val m = MediaCodecs.parseBmp(bytes)
          assert(m.contains(MediaCodecs.BmpMeta(expect.get("width").asInt(),
            expect.get("height").asInt(), expect.get("bpp").asInt())), file)
        case "wav" =>
          val m = MediaCodecs.parseWav(bytes)
          assert(m.contains(MediaCodecs.WavMeta(expect.get("rate").asInt(),
            expect.get("channels").asInt(), expect.get("bits").asInt(),
            expect.get("frames").asInt())), file)
        case "y4m" =>
          val m = MediaCodecs.parseY4m(bytes)
          assert(m.contains(MediaCodecs.Y4mMeta(expect.get("width").asInt(),
            expect.get("height").asInt(), expect.get("fn").asInt(),
            expect.get("fd").asInt(), expect.get("frames").asInt())), file)
      }
    }
  }

  test("parseBmpChannel0: pixel-exact top-down planes from both row " +
    "orders and both direct-color depths; palette refuses") {
    // Python fixture pixels: storage row y, byte i = (7y + 13i) % 256;
    // channel0 of pixel x = byte i = step·x. Bottom-up files flip rows.
    def pinned(file: String, w: Int, h: Int, step: Int, topdown: Boolean)
        : Unit = {
      val Some((gw, gh, px)) =
        MediaCodecs.parseBmpChannel0(resource(s"/media/$file"))
      assert((gw, gh) === ((w, h)), file)
      for (y <- 0 until h; x <- 0 until w) {
        val srcRow = if (topdown) y else h - 1 - y
        assert((px(y * w + x) & 0xFF) === (7 * srcRow + 13 * step * x) % 256,
          s"$file ($x,$y)")
      }
    }
    pinned("img_7x5_24.bmp", 7, 5, 3, topdown = false)
    pinned("img_5x3_topdown.bmp", 5, 3, 3, topdown = true)
    pinned("img_6x4_32.bmp", 6, 4, 4, topdown = false)
    assert(MediaCodecs.parseBmpChannel0(
      resource("/media/img_9x2_8pal.bmp")).isEmpty,
      "palette depths are lookups, not samples")
    assert(MediaCodecs.parseBmpChannel0(
      resource("/media/bad_truncated.bmp")).isEmpty)
    // Scala builder round trip: decoded (x, y) reads the builder pattern
    // at flipped row h-1-y (builder stores bottom-up)
    for (w <- Seq(4, 7); h <- Seq(3, 6); seed <- Seq(0L, 9L)) {
      val Some((_, _, px)) =
        MediaCodecs.parseBmpChannel0(MediaCodecs.buildBmp(w, h, seed))
      for (y <- 0 until h; x <- 0 until w)
        assert((px(y * w + x) & 0xFF) ===
          ((seed + 31 * x + 17 * (h - 1 - y)) % 256).toInt, s"($x,$y)")
    }
  }

  test("build→parse round trip across the generator parameter grid") {
    for (w <- Seq(1, 4, 5, 7, 63); h <- Seq(1, 3, 63); seed <- Seq(0L, 7L)) {
      assert(MediaCodecs.parseBmp(MediaCodecs.buildBmp(w, h, seed))
        .contains(MediaCodecs.BmpMeta(w, h, 24)), s"bmp ${w}x$h")
    }
    for (rate <- Seq(8000, 16000, 44100); n <- Seq(0, 1, 50, 249)) {
      assert(MediaCodecs.parseWav(MediaCodecs.buildWav(rate, n, 3L))
        .contains(MediaCodecs.WavMeta(rate, 1, 16, n)), s"wav $rate/$n")
    }
    for (w <- Seq(2, 8, 30); h <- Seq(2, 24); nf <- Seq(0, 1, 30)) {
      assert(MediaCodecs.parseY4m(MediaCodecs.buildY4m(w, h, nf, 9L))
        .contains(MediaCodecs.Y4mMeta(w, h, 25, 1, nf)), s"y4m ${w}x$h/$nf")
    }
  }

  test("built payload sizes match the m01 oracle's closed-form byte math") {
    // the oracle predicts n_bytes from (w, h, n, nf) alone — these
    // equalities are exactly what keeps that SQL honest
    for (w <- Seq(4, 5, 63); h <- Seq(3, 60))
      assert(MediaCodecs.buildBmp(w, h, 1L).length ==
        54 + ((3 * w + 3) / 4) * 4 * h, s"bmp ${w}x$h")
    for (n <- Seq(50, 249))
      assert(MediaCodecs.buildWav(8000, n, 1L).length == 44 + 2 * n)
    for (w <- Seq(8, 30); h <- Seq(8, 30); nf <- Seq(1, 30))
      assert(MediaCodecs.buildY4m(w, h, nf, 1L).length ==
        MediaCodecs.y4mHeader(w, h).length + 1 + nf * (6 + w * h * 3 / 2))
  }

  test("parseWavData: exact signed samples back from the builder's LCG, " +
    "agreeing with parseWav's meta; rejects what parseWav rejects") {
    for (n <- Seq(0, 1, 50, 249); seed <- Seq(0L, 7L, 4999L)) {
      val Some((meta, samples)) =
        MediaCodecs.parseWavData(MediaCodecs.buildWav(8000, n, seed))
      assert(meta === MediaCodecs.WavMeta(8000, 1, 16, n))
      assert(samples.length === n)
      for (i <- 0 until n) {
        val u = ((seed * 31 + i * 2654435761L) % 65536L).toInt
        val want = if (u >= 32768) u - 65536 else u
        assert(samples(i) === want, s"seed=$seed i=$i")
      }
    }
    val wav = MediaCodecs.buildWav(8000, 20, 2L)
    assert(MediaCodecs.parseWavData(wav.dropRight(5)).isEmpty)
    assert(MediaCodecs.parseWavData(null).isEmpty)
    assert(MediaCodecs.parseWavData(MediaCodecs.buildBmp(4, 4, 1L)).isEmpty)
  }

  test("parseY4mLuma: sample-exact luma planes from the builder's fill, " +
    "chroma excluded; rejects what parseY4m rejects") {
    for ((w, h, nf) <- Seq((8, 8, 1), (8, 6, 3), (30, 28, 5));
         seed <- Seq(0L, 7L, 4999L)) {
      val Some((meta, lumas)) =
        MediaCodecs.parseY4mLuma(MediaCodecs.buildY4m(w, h, nf, seed))
      assert(meta.width === w && meta.height === h && meta.nFrames === nf)
      assert(lumas.length === nf)
      lumas.zipWithIndex.foreach { case (plane, f) =>
        assert(plane.length === w * h, s"luma plane is w*h, not w*h*3/2")
        for (i <- Seq(0, 1, w * h / 2, w * h - 1))
          assert((plane(i) & 0xFF) === ((seed + 131L * f + i) % 256).toInt,
            s"seed=$seed f=$f i=$i")
      }
    }
    val y4m = MediaCodecs.buildY4m(8, 8, 2, 2L)
    assert(MediaCodecs.parseY4mLuma(y4m.dropRight(5)).isEmpty)
    assert(MediaCodecs.parseY4mLuma(null).isEmpty)
    assert(MediaCodecs.parseY4mLuma(MediaCodecs.buildWav(8000, 5, 1L)).isEmpty)
  }

  test("truncated payloads never parse (poison rows degrade, not crash)") {
    val bmp = MediaCodecs.buildBmp(8, 8, 2L)
    val wavB = MediaCodecs.buildWav(8000, 20, 2L)
    val y4m = MediaCodecs.buildY4m(8, 8, 2, 2L)
    for (k <- Seq(1, 10, 53)) {
      assert(MediaCodecs.parseBmp(bmp.dropRight(k)).isEmpty, s"bmp -$k")
      assert(MediaCodecs.parseWav(wavB.dropRight(k)).isEmpty, s"wav -$k")
      assert(MediaCodecs.parseY4m(y4m.dropRight(k)).isEmpty, s"y4m -$k")
    }
    assert(MediaCodecs.parseBmp(Array.emptyByteArray).isEmpty)
    assert(MediaCodecs.parseWav(null).isEmpty)
    assert(MediaCodecs.parseY4m(Array.fill(300)('Y'.toByte)).isEmpty)
  }

  test("crafted overflow payloads degrade to None, never throw " +
    "(Int-overflow bounds-check regressions)") {
    def le32At(b: Array[Byte], off: Int, v: Int): Unit =
      (0 to 3).foreach(i => b(off + i) = ((v >> (8 * i)) & 0xFF).toByte)
    // WAV whose data chunk declares a near-Int.MaxValue size: the naive
    // `off + 8 + size > length` wraps negative and passes
    val wavB = MediaCodecs.buildWav(8000, 20, 2L)
    val hugeChunk = wavB.clone()
    le32At(hugeChunk, 40, 0x7FFFFFF0) // data chunk size field
    assert(MediaCodecs.parseWav(hugeChunk).isEmpty)
    assert(MediaCodecs.parseWavData(hugeChunk).isEmpty)
    // BMP with height 0x80000000: math.abs(Int.MinValue) == Int.MinValue
    val bmp = MediaCodecs.buildBmp(8, 8, 2L)
    val minHeight = bmp.clone()
    le32At(minHeight, 22, Int.MinValue)
    assert(MediaCodecs.parseBmp(minHeight).isEmpty)
    // Y4M whose header dimensions overflow w*h*3/2 into a negative Int
    val hdr = "YUV4MPEG2 W46341 H46341 F25:1 C420\nFRAME\n"
    val y4m = hdr.getBytes("US-ASCII") ++ Array.fill(64)(0.toByte)
    assert(MediaCodecs.parseY4m(y4m).isEmpty)
    assert(MediaCodecs.parseY4mLuma(y4m).isEmpty)
  }

  test("decode sniffs the container from bytes, not the kind label") {
    val mislabeled = Multimodal.MediaRow(7L, "audio", MediaCodecs.buildBmp(6, 4, 7L))
    val m = Multimodal.decode(mislabeled)
    assert(m.ok && m.width == 6 && m.height == 4 && m.n_frames == 1 &&
      m.sample_rate == 0 && m.kind == "audio") // envelope label passes through
    val garbage = Multimodal.decode(Multimodal.MediaRow(8L, "image",
      Array.fill(64)(0x5a.toByte)))
    assert(!garbage.ok && garbage.n_bytes == 64L)
  }
}
