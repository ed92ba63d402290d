package graft.ext

/** [EXT] Real (non-stub) byte-level media header codec for the two
  * container formats parseable without any codec library: BMP
  * (BITMAPINFOHEADER) and canonical PCM WAV (RIFF/fmt). Pure
  * little-endian byte arithmetic — this replaces [[Multimodal.FakeCodec]]
  * for payloads that actually carry these magics, and is exactly the
  * seam where a full decoder (pixel data, samples) would plug in.
  *
  * Layout references (public format specs):
  *   BMP: "BM" magic; BITMAPINFOHEADER at offset 14 — width i32le@18,
  *        height i32le@22, planes u16le@26, bitsPerPixel u16le@28.
  *   WAV: "RIFF" @0, "WAVE" @8, "fmt " chunk @12 — channels u16le@22,
  *        sampleRate u32le@24, bitsPerSample u16le@34.
  */
object MediaCodec {

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    putLe16(b, off, v & 0xffff); putLe16(b, off + 2, (v >> 16) & 0xffff)
  }

  /** "bmp" | "wav" | "unknown" by magic bytes. */
  def detect(b: Array[Byte]): String =
    if (b != null && b.length >= 54 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b != null && b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else "unknown"

  final case class BmpHeader(width: Int, height: Int, bitsPerPixel: Int)
  final case class WavHeader(channels: Int, sampleRate: Int, bitsPerSample: Int)

  def parseBmp(b: Array[Byte]): BmpHeader = {
    require(detect(b) == "bmp", "not a BMP payload")
    BmpHeader(le32(b, 18), le32(b, 22), le16(b, 28))
  }

  def parseWav(b: Array[Byte]): WavHeader = {
    require(detect(b) == "wav", "not a WAV payload")
    WavHeader(le16(b, 22), le32(b, 24), le16(b, 34))
  }

  /** Minimal valid BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER, 24 bpp, no pixel data (header-only payload —
    * the metadata path never reads pixels).
    */
  def synthesizeBmp(width: Int, height: Int): Array[Byte] = {
    val b = new Array[Byte](54)
    b(0) = 'B'; b(1) = 'M'
    putLe32(b, 2, 54)        // file size
    putLe32(b, 10, 54)       // pixel data offset
    putLe32(b, 14, 40)       // DIB header size
    putLe32(b, 18, width)
    putLe32(b, 22, height)
    putLe16(b, 26, 1)        // planes
    putLe16(b, 28, 24)       // bits per pixel
    b
  }

  /** Canonical 44-byte PCM WAV header, zero data samples. */
  def synthesizeWav(
      channels: Int, sampleRate: Int, bitsPerSample: Int = 16): Array[Byte] = {
    val b = new Array[Byte](44)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    putLe32(b, 4, 36)        // RIFF chunk size (no data)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    putLe32(b, 16, 16)       // fmt chunk size
    putLe16(b, 20, 1)        // PCM
    putLe16(b, 22, channels)
    putLe32(b, 24, sampleRate)
    putLe32(b, 28, sampleRate * channels * bitsPerSample / 8) // byte rate
    putLe16(b, 32, channels * bitsPerSample / 8)              // block align
    putLe16(b, 34, bitsPerSample)
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
    putLe32(b, 40, 0)        // data size
    b
  }
}
