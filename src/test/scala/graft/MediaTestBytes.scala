package graft

/** Hand-authored WAV bytes + the m11 delta-sign fixtures, shared by the
  * batch specs (AudioClustersSpec, AudioFingerprintSpec) and the streaming
  * detector spec so they drive the SAME byte layout — a header or fixture
  * change happens once, or the specs silently test different files.
  * Independent of MediaCodecs.buildWav on purpose: these bytes come from a
  * second (test-side) writer, so a compensating builder/parser bug cannot
  * hide behind one implementation.
  */
object MediaTestBytes {

  /** Mono 16-bit 8 kHz RIFF-WAVE around the given samples. */
  def wav(samples: Seq[Int]): Array[Byte] = {
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

  /** Windows of `frames` samples at the given constant amplitudes — one
    * delta-sign bit per adjacent level pair at windowFrames = frames. */
  def clip(levels: Seq[Int], frames: Int = 4): Array[Byte] =
    wav(levels.flatMap(l => Seq.fill(frames)(l)))

  // The m11 fixture trio (40 windows -> 39 delta bits at 4-frame windows):
  /** all 39 bits 1 */
  val rising: Seq[Int] = (1 to 40).map(_ * 100)
  /** identical first 33 windows (print-equal to rising), then falling —
    * full-series Hamming 6 from rising */
  val diverges: Seq[Int] =
    (1 to 34).map(_ * 100) ++ (1 to 6).map(i => 3400 - i * 100)
  /** rising with ONE late dip (window 36) — full-series Hamming 1 */
  val oneDip: Seq[Int] = rising.updated(36, 3500)
}
