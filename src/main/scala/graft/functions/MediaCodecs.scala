package graft.functions

/** Pure-JVM builders and parsers for three UNCOMPRESSED public media
  * containers — BMP (image), RIFF/WAVE PCM (audio), YUV4MPEG2 (video) —
  * chosen because their layouts are fully specified by public format
  * documentation and need no native codec, so the multimodal decode path
  * (Multimodal.extractMeta) can parse real container bytes in this
  * sandbox instead of the former deterministic stub.
  *
  * Cross-implementation evidence (the P19 murmur3 recipe): the files under
  * src/test/resources/media/ are written by tools/media_fixture.py with
  * independent Python struct.pack code — including variants this module's
  * builders never emit (top-down BMPs, WAVs with LIST chunks before data,
  * C422/C444/Cmono Y4M, frame-parameter Y4M) — and MediaCodecsSpec pins
  * these parsers to that manifest. A compensating builder/parser bug
  * (e.g. both sides big-endian) cannot survive that gate.
  *
  * Parsers return None on anything malformed — wrong magic, truncated
  * header, truncated payload, unsupported compression — never throw:
  * at corpus scale a decode stage must degrade per-row (ok=false), not
  * kill the task.
  */
object MediaCodecs {

  final case class BmpMeta(width: Int, height: Int, bitsPerPixel: Int)
  final case class WavMeta(sampleRate: Int, channels: Int,
      bitsPerSample: Int, nFrames: Int)
  final case class Y4mMeta(width: Int, height: Int, fpsNum: Int,
      fpsDen: Int, nFrames: Int)

  // ---- little-endian primitives -----------------------------------------

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private def putLe16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putLe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
    b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
  }
  private def putAscii(b: Array[Byte], i: Int, s: String): Unit = {
    var j = 0
    while (j < s.length) { b(i + j) = s.charAt(j).toByte; j += 1 }
  }

  // ---- BMP ---------------------------------------------------------------

  /** Bytes per padded BMP pixel row (24bpp rows pad to 4-byte multiples). */
  def bmpRowSize(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** 24bpp bottom-up BI_RGB BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER + padded pixel rows. Pixels are a deterministic
    * function of (seed, x, y) so payloads are reproducible row-for-row.
    */
  def buildBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, s"bmp dims ${width}x$height")
    val rowSize = bmpRowSize(width)
    val size = 54 + rowSize * height
    val b = new Array[Byte](size)
    putAscii(b, 0, "BM"); putLe32(b, 2, size); putLe32(b, 10, 54)
    putLe32(b, 14, 40); putLe32(b, 18, width); putLe32(b, 22, height)
    putLe16(b, 26, 1); putLe16(b, 28, 24)
    putLe32(b, 34, rowSize * height); putLe32(b, 38, 2835); putLe32(b, 42, 2835)
    var y = 0
    while (y < height) {
      val row = 54 + y * rowSize
      var x = 0
      while (x < width) {
        val v = ((seed + 31L * x + 17L * y) % 256).toInt
        b(row + 3 * x) = v.toByte
        b(row + 3 * x + 1) = ((v + 85) % 256).toByte
        b(row + 3 * x + 2) = ((v + 170) % 256).toByte
        x += 1
      }
      y += 1
    }
    b
  }

  /** Header-parse a BMP. Accepts any BI_RGB (uncompressed) bit depth and
    * both row orders (negative height = top-down); reported height is the
    * magnitude. Validates the pixel array actually fits in the buffer so a
    * truncated payload reads as malformed, not as a phantom image.
    */
  def parseBmp(b: Array[Byte]): Option[BmpMeta] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    if (le32(b, 2) != b.length) return None
    val dataOffset = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40) return None
    val width = le32(b, 18)
    val rawHeight = le32(b, 22)
    // math.abs(Int.MinValue) IS Int.MinValue (two's complement): a crafted
    // height field of 0x80000000 would pass every magnitude check below
    // and crash the plane decode with a negative array size
    if (rawHeight == Int.MinValue) return None
    val height = math.abs(rawHeight)
    val planes = le16(b, 26)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (width <= 0 || height == 0 || planes != 1 || compression != 0) return None
    if (bpp != 1 && bpp != 4 && bpp != 8 && bpp != 16 && bpp != 24 && bpp != 32)
      return None
    val rowBytes = ((width.toLong * bpp + 31) / 32) * 4
    if (dataOffset < 14 + dibSize ||
        dataOffset.toLong + rowBytes * height > b.length) return None
    Some(BmpMeta(width, height, bpp))
  }

  /** Decode the channel-0 plane (blue, for BGR pixel order) of a 24/32bpp
    * BI_RGB BMP as a TOP-DOWN row-major byte array — the orientation a
    * real image decoder hands to vision code, regardless of the on-disk
    * row order (positive height = bottom-up storage, flipped here;
    * negative = already top-down). Palette depths return None: an indexed
    * pixel is a color-table lookup, not a sample, and the m06 hash is
    * defined over direct-color planes. Malformed payloads degrade to None
    * via [[parseBmp]]'s validation (the decode-stage poison-row rule).
    */
  def parseBmpChannel0(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    parseBmp(b) match {
      case Some(BmpMeta(w, h, bpp)) if bpp == 24 || bpp == 32 =>
        val rawHeight = le32(b, 22)
        val dataOffset = le32(b, 10)
        val rowBytes = (((w.toLong * bpp + 31) / 32) * 4).toInt
        val step = bpp / 8
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          val srcRow = if (rawHeight > 0) h - 1 - y else y
          val base = dataOffset + srcRow * rowBytes
          var x = 0
          while (x < w) { out(y * w + x) = b(base + step * x); x += 1 }
          y += 1
        }
        Some((w, h, out))
      case _ => None
    }

  // ---- RIFF/WAVE ---------------------------------------------------------

  /** Canonical 44-byte-header mono 16-bit PCM WAV with `nFrames` samples
    * derived deterministically from (seed, index).
    */
  def buildWav(sampleRate: Int, nFrames: Int, seed: Long): Array[Byte] = {
    require(sampleRate > 0 && nFrames >= 0, s"wav $sampleRate/$nFrames")
    val dataSize = 2 * nFrames
    val b = new Array[Byte](44 + dataSize)
    putAscii(b, 0, "RIFF"); putLe32(b, 4, 36 + dataSize); putAscii(b, 8, "WAVE")
    putAscii(b, 12, "fmt "); putLe32(b, 16, 16)
    putLe16(b, 20, 1); putLe16(b, 22, 1); putLe32(b, 24, sampleRate)
    putLe32(b, 28, sampleRate * 2); putLe16(b, 32, 2); putLe16(b, 34, 16)
    putAscii(b, 36, "data"); putLe32(b, 40, dataSize)
    var i = 0
    while (i < nFrames) {
      putLe16(b, 44 + 2 * i, (((seed * 31 + i * 2654435761L) % 65536) & 0xffff).toInt)
      i += 1
    }
    b
  }

  /** Chunk-walking WAV parse: requires RIFF/WAVE magic, then scans the
    * chunk list for `fmt ` (PCM only) and `data`, skipping unknown chunks
    * (LIST, fact, ...) with odd-size padding per the RIFF spec — so files
    * from real writers that interleave metadata chunks parse correctly.
    * nFrames = data size / block align.
    */
  def parseWav(b: Array[Byte]): Option[WavMeta] = {
    if (b == null || b.length < 12) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F') return None
    if (b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    if (le32(b, 4).toLong + 8 > b.length) return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // rate, channels, bits, blockAlign
    var dataSize = -1
    while (off + 8 <= b.length && (fmt.isEmpty || dataSize < 0)) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = le32(b, off + 4)
      // Long arithmetic: a crafted size near Int.MaxValue would overflow
      // `off + 8 + size` negative and slip past the bounds check,
      // violating the never-throw contract downstream
      if (size < 0 || off.toLong + 8 + size > b.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = le16(b, off + 8)
          if (audioFormat != 1) return None // PCM only in this sandbox
          fmt = Some((le32(b, off + 12), le16(b, off + 10),
            le16(b, off + 22), le16(b, off + 20)))
        case "data" => dataSize = size
        case _ => () // skip LIST/fact/bext/...
      }
      off += 8 + size + (size & 1) // RIFF chunks pad to even offsets
    }
    fmt match {
      case Some((rate, channels, bits, blockAlign))
          if dataSize >= 0 && blockAlign > 0 && rate > 0 && channels > 0 =>
        Some(WavMeta(rate, channels, bits, dataSize / blockAlign))
      case _ => None
    }
  }

  /** [[parseWav]] plus the decoded PCM: the first-channel signed 16-bit
    * sample of every frame (the builder writes mono, so frame == sample;
    * for multi-channel files this is the per-frame channel-0 series the
    * loudness profile wants). Same chunk-walking validation; None on
    * anything [[parseWav]] rejects or a non-16-bit stream.
    */
  def parseWavData(b: Array[Byte]): Option[(WavMeta, Array[Int])] = {
    if (b == null || b.length < 12) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F') return None
    if (b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    if (le32(b, 4).toLong + 8 > b.length) return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    var dataOff = -1
    var dataSize = -1
    while (off + 8 <= b.length && (fmt.isEmpty || dataSize < 0)) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = le32(b, off + 4)
      if (size < 0 || off.toLong + 8 + size > b.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          if (le16(b, off + 8) != 1) return None
          fmt = Some((le32(b, off + 12), le16(b, off + 10),
            le16(b, off + 22), le16(b, off + 20)))
        case "data" => dataOff = off + 8; dataSize = size
        case _ => ()
      }
      off += 8 + size + (size & 1)
    }
    fmt match {
      case Some((rate, channels, bits, blockAlign))
          if dataSize >= 0 && blockAlign > 0 && rate > 0 && channels > 0 &&
            bits == 16 =>
        val n = dataSize / blockAlign
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val u = le16(b, dataOff + i * blockAlign)
          out(i) = if (u >= 32768) u - 65536 else u
          i += 1
        }
        Some((WavMeta(rate, channels, bits, n), out))
      case _ => None
    }
  }

  // ---- YUV4MPEG2 ---------------------------------------------------------

  def y4mHeader(width: Int, height: Int): String =
    s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C420"

  /** Uncompressed C420 YUV4MPEG2 stream: ASCII stream header, then
    * `FRAME\n` + w*h*3/2 raw planar bytes per frame. Even dims required by
    * 4:2:0 subsampling.
    */
  def buildY4m(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      s"y4m dims ${width}x$height")
    val header = (y4mHeader(width, height) + "\n").getBytes("US-ASCII")
    val frameBytes = width * height * 3 / 2
    val b = new Array[Byte](header.length + nFrames * (6 + frameBytes))
    System.arraycopy(header, 0, b, 0, header.length)
    var f = 0
    while (f < nFrames) {
      val base = header.length + f * (6 + frameBytes)
      putAscii(b, base, "FRAME"); b(base + 5) = '\n'
      var i = 0
      while (i < frameBytes) {
        b(base + 6 + i) = ((seed + 131L * f + i) % 256).toByte
        i += 1
      }
      f += 1
    }
    b
  }

  /** Long-valued so a header-supplied w·h near 2^16×2^16 cannot overflow
    * Int into a negative frame size (the caller bounds the result against
    * the buffer length before narrowing). */
  private def frameBytesFor(cs: String, w: Int, h: Int): Option[Long] = cs match {
    case "420" | "420jpeg" | "420mpeg2" | "420paldv" => Some(w.toLong * h * 3 / 2)
    case "422" => Some(w.toLong * h * 2)
    case "444" => Some(w.toLong * h * 3)
    case "mono" => Some(w.toLong * h)
    case _ => None
  }

  /** Parse a YUV4MPEG2 stream and COUNT its frames by walking the
    * FRAME-marker chain (each frame may carry its own parameters up to the
    * newline). Chroma subsampling (C tag, default 420jpeg per spec)
    * determines the frame payload size; a final truncated frame makes the
    * whole stream malformed.
    */
  def parseY4m(b: Array[Byte]): Option[Y4mMeta] =
    walkY4m(b, collectLuma = false).map(_._1)

  /** [[parseY4m]] plus the decoded LUMA planes (the first w·h bytes of
    * each 4:2:0 frame payload) — what a temporal-activity pass consumes.
    * Same validity rules: any malformed or truncated frame rejects the
    * whole stream.
    */
  def parseY4mLuma(b: Array[Byte]): Option[(Y4mMeta, Array[Array[Byte]])] =
    walkY4m(b, collectLuma = true)

  private def walkY4m(b: Array[Byte],
      collectLuma: Boolean): Option[(Y4mMeta, Array[Array[Byte]])] = {
    val magic = "YUV4MPEG2"
    if (b == null || b.length < magic.length + 1) return None
    var i = 0
    while (i < magic.length) {
      if (b(i) != magic.charAt(i)) return None
      i += 1
    }
    val nl = b.indexOf('\n'.toByte)
    if (nl < 0 || nl > 256) return None
    val tokens = new String(b, 0, nl, "US-ASCII").split(" ").drop(1)
    var w = -1; var h = -1; var fn = -1; var fd = -1; var cs = "420jpeg"
    try {
      tokens.filter(_.nonEmpty).foreach { t =>
        t.charAt(0) match {
          case 'W' => w = t.substring(1).toInt
          case 'H' => h = t.substring(1).toInt
          case 'F' =>
            val parts = t.substring(1).split(":")
            if (parts.length != 2) return None
            fn = parts(0).toInt; fd = parts(1).toInt
          case 'C' => cs = t.substring(1)
          case _ => () // I (interlacing), A (aspect), X (extensions)
        }
      }
    } catch { case _: NumberFormatException => return None }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
    // bound frameBytes to Int BEFORE narrowing (header-supplied w·h near
    // 2^16×2^16 overflows `w*h*3/2` negative, slipping past the per-frame
    // fit check below); a ZERO-frame stream is valid, so fitting the
    // buffer is checked per frame, not here — this bound only proves the
    // narrowed frameBytes (and w·h for the luma copyOfRange) are sane Ints
    val frameBytes = frameBytesFor(cs, w, h) match {
      case Some(fb) if fb > 0 && fb <= Int.MaxValue - 16 => fb.toInt
      case _ => return None
    }
    var off = nl + 1
    var frames = 0
    val lumas = Array.newBuilder[Array[Byte]]
    while (off < b.length) {
      // "FRAME" marker, optional parameters, newline, then the payload
      if (off + 6 > b.length) return None
      val mk = "FRAME"
      var j = 0
      while (j < mk.length) {
        if (b(off + j) != mk.charAt(j)) return None
        j += 1
      }
      var p = off + 5
      while (p < b.length && b(p) != '\n') p += 1
      if (p >= b.length || p.toLong + 1 + frameBytes > b.length) return None
      if (collectLuma)
        lumas += java.util.Arrays.copyOfRange(b, p + 1, p + 1 + w * h)
      off = p + 1 + frameBytes
      frames += 1
    }
    Some((Y4mMeta(w, h, fn, fd, frames), lumas.result()))
  }
}
