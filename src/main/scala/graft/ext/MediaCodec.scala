package graft.ext

/** [EXT] Real (non-stub) byte-level media header codec for the six
  * container formats parseable without any codec library: BMP
  * (BITMAPINFOHEADER), canonical PCM WAV (RIFF/fmt), PNG (IHDR),
  * JPEG/JFIF (SOF marker scan), GIF (logical screen descriptor), and
  * WebP (VP8X extended header / VP8L lossless bitstream header). Pure
  * byte arithmetic — the real-decode backend behind every
  * [[Multimodal]] media path (the former fake codec is gone), and
  * exactly the seam where a full compressed-pixel decoder would plug
  * in.
  *
  * Layout references (public format specs):
  *   BMP: "BM" magic; BITMAPINFOHEADER at offset 14 — width i32le@18,
  *        height i32le@22, planes u16le@26, bitsPerPixel u16le@28.
  *   WAV: "RIFF" @0, "WAVE" @8, "fmt " chunk @12 — channels u16le@22,
  *        sampleRate u32le@24, bitsPerSample u16le@34.
  *   PNG: 8-byte signature 89 50 4E 47 0D 0A 1A 0A; first chunk must
  *        be IHDR — width u32be@16, height u32be@20, bit depth u8@24,
  *        color type u8@25 (0 gray, 2 rgb, 3 palette, 4 gray+alpha,
  *        6 rgba → 1/3/1/2/4 channels).
  *   JPEG: SOI FF D8, then marker segments FF xx with u16be lengths;
  *        the frame header SOFn (FF C0–CF except C4/C8/CC) carries
  *        precision u8, height u16be, width u16be, components u8.
  *        Entropy-coded data never follows before SOF, so a pure
  *        segment walk finds it without decoding.
  *   GIF: "GIF87a"/"GIF89a" @0; logical screen descriptor — width
  *        u16le@6, height u16le@8, packed u8@10 (bit 7 global color
  *        table flag, bits 6-4 color resolution − 1, bits 2-0 GCT
  *        size n with 2^(n+1) entries).
  *   WebP: RIFF @0, "WEBP" @8, then one chunk @12. VP8X — u32le size
  *        10, flags u8@20, canvas (width−1) u24le@24, (height−1)
  *        u24le@27. VP8L — 1-byte signature 0x2F @20, then a 32-bit
  *        little-endian field: 14 bits width−1, 14 bits height−1,
  *        1 alpha bit, 3 version bits (must be 0).
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

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def putBe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >> 8) & 0xff).toByte; b(off + 1) = (v & 0xff).toByte
  }
  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    putBe16(b, off, (v >> 16) & 0xffff); putBe16(b, off + 2, v & 0xffff)
  }

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** "bmp" | "wav" | "png" | "jpeg" | "gif" | "webp" | "unknown" by
    * magic bytes.
    */
  def detect(b: Array[Byte]): String =
    if (b != null && b.length >= 54 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b != null && b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else if (b != null && b.length >= 26 &&
      b.take(8).sameElements(PngSig) &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') "png"
    else if (b != null && b.length >= 4 &&
      (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
    else if (b != null && b.length >= 13 &&
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a') "gif"
    else if (b != null && b.length >= 25 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') "webp"
    else "unknown"

  final case class BmpHeader(width: Int, height: Int, bitsPerPixel: Int)
  final case class WavHeader(channels: Int, sampleRate: Int, bitsPerSample: Int)
  final case class PngHeader(
      width: Int, height: Int, bitDepth: Int, colorType: Int) {
    /** Channel count implied by the color type (PNG spec §11.2.2). */
    def channels: Int = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case other =>
        throw new IllegalArgumentException(s"bad PNG color type $other")
    }
  }
  final case class JpegHeader(
      precision: Int, width: Int, height: Int, components: Int)
  /** `gctEntries` is 0 when no global color table is present;
    * `colorResolution` is bits per primary (1-8).
    */
  final case class GifHeader(
      width: Int, height: Int, gctEntries: Int, colorResolution: Int) {
    /** Palette index depth: bits per pixel of the indexed stream. */
    def indexBits: Int =
      if (gctEntries == 0) 0
      else 31 - Integer.numberOfLeadingZeros(gctEntries)
  }
  /** `variant` is "vp8x" (extended) or "vp8l" (lossless). */
  final case class WebpHeader(variant: String, width: Int, height: Int)

  def parseBmp(b: Array[Byte]): BmpHeader = {
    require(detect(b) == "bmp", "not a BMP payload")
    BmpHeader(le32(b, 18), le32(b, 22), le16(b, 28))
  }

  def parseWav(b: Array[Byte]): WavHeader = {
    require(detect(b) == "wav", "not a WAV payload")
    WavHeader(le16(b, 22), le32(b, 24), le16(b, 34))
  }

  def parsePng(b: Array[Byte]): PngHeader = {
    require(detect(b) == "png", "not a PNG payload")
    PngHeader(be32(b, 16), be32(b, 20), b(24) & 0xff, b(25) & 0xff)
  }

  def parseGif(b: Array[Byte]): GifHeader = {
    require(detect(b) == "gif", "not a GIF payload")
    val packed = b(10) & 0xff
    val entries = if ((packed & 0x80) != 0) 1 << ((packed & 0x07) + 1) else 0
    GifHeader(le16(b, 6), le16(b, 8), entries, ((packed >> 4) & 0x07) + 1)
  }

  private def le24(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16)
  private def putLe24(b: Array[Byte], off: Int, v: Int): Unit = {
    putLe16(b, off, v & 0xffff); b(off + 2) = ((v >> 16) & 0xff).toByte
  }

  def parseWebp(b: Array[Byte]): WebpHeader = {
    require(detect(b) == "webp", "not a WebP payload")
    val tag = new String(b.slice(12, 16), "US-ASCII")
    tag match {
      case "VP8X" =>
        WebpHeader("vp8x", le24(b, 24) + 1, le24(b, 27) + 1)
      case "VP8L" =>
        require((b(20) & 0xff) == 0x2f, "bad VP8L signature byte")
        val v = le32(b, 21)
        require(((v >>> 29) & 0x7) == 0, "unsupported VP8L version")
        WebpHeader("vp8l", (v & 0x3fff) + 1, ((v >>> 14) & 0x3fff) + 1)
      case other =>
        throw new IllegalArgumentException(s"unsupported WebP chunk '$other'")
    }
  }

  /** Walk the JPEG marker-segment stream to the frame header (SOFn).
    * Standalone markers (RSTn, TEM, and repeated fill FFs) carry no
    * length; every other segment is skipped by its u16be length. The
    * walk is bounded: it stops at SOS/EOI (entropy-coded data — a
    * stream with no SOF before SOS is malformed).
    */
  def parseJpeg(b: Array[Byte]): JpegHeader = {
    require(detect(b) == "jpeg", "not a JPEG payload")
    // Long cursor + an explicit bound before EVERY read: segment
    // lengths and 0xFF fill runs come from untrusted bytes. An Int
    // walk has a wrap window near Int.MaxValue (the WAV chunk-walk
    // class), and the fill-skip loop can park the cursor close enough
    // to the end that the segment-length read itself runs off the
    // buffer — both must fault as IllegalArgumentException, never
    // AIOOBE.
    var off: Long = 2L
    while (off + 4 <= b.length) {
      if ((b(off.toInt) & 0xff) != 0xff)
        throw new IllegalArgumentException(
          f"bad JPEG marker alignment at $off (0x${b(off.toInt) & 0xff}%02x)")
      var m = b(off.toInt + 1) & 0xff
      while (m == 0xff && off + 2 < b.length) {
        off += 1; m = b(off.toInt + 1) & 0xff
      }
      m match {
        case mk if mk >= 0xc0 && mk <= 0xcf &&
          mk != 0xc4 && mk != 0xc8 && mk != 0xcc =>
          // SOFn: len u16be, precision u8, height u16be, width u16be, nc u8
          require(off + 9 < b.length, "truncated SOF segment")
          return JpegHeader(
            b(off.toInt + 4) & 0xff, be16(b, off.toInt + 7),
            be16(b, off.toInt + 5), b(off.toInt + 9) & 0xff)
        case 0xd9 | 0xda => // EOI / SOS without a frame header
          throw new IllegalArgumentException("JPEG stream has no SOF marker")
        case mk if mk == 0x01 || (mk >= 0xd0 && mk <= 0xd7) =>
          off += 2 // standalone marker, no length
        case _ =>
          require(off + 4 <= b.length, "truncated JPEG segment length")
          off += 2L + be16(b, off.toInt + 2)
      }
    }
    throw new IllegalArgumentException("JPEG stream has no SOF marker")
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

  /** 24-bit BMP with REAL pixel data — `pixel(x, y, c)` returns the
    * channel byte for channel c ∈ {0=B, 1=G, 2=R} at TOP-DOWN
    * coordinates; the writer stores rows BOTTOM-UP with each row
    * padded to a 4-byte boundary (the two classic BMP traps).
    */
  def synthesizeBmp24(
      width: Int, height: Int,
      pixel: (Int, Int, Int) => Int): Array[Byte] = {
    val rowBytes = ((3 * width + 3) / 4) * 4
    val dataBytes = rowBytes * height
    val b = new Array[Byte](54 + dataBytes)
    System.arraycopy(synthesizeBmp(width, height), 0, b, 0, 54)
    putLe32(b, 2, 54 + dataBytes)  // file size
    putLe32(b, 34, dataBytes)      // image size
    var y = 0
    while (y < height) {
      val row = 54 + (height - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < width) {
        var c = 0
        while (c < 3) {
          b(row + 3 * x + c) = (pixel(x, y, c) & 0xff).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    b
  }

  final case class Bmp24(width: Int, height: Int, pixels: Array[Int]) {
    /** Channel byte at top-down (x, y), c ∈ {0=B,1=G,2=R}. */
    def apply(x: Int, y: Int, c: Int): Int = pixels(3 * (y * width + x) + c)
  }

  /** Walk the RIFF chunk list from offset 12 to the `data` chunk
    * header. The cursor is a Long: a non-data chunk declaring a size
    * near Int.MaxValue must walk OFF the end of the buffer, not wrap
    * negative and re-enter it (untrusted-bytes contract — an Int
    * cursor made `b(off)` reachable with off < 0 after `off += 8+sz`
    * wrapped, throwing AIOOBE from inside the bounds guard itself).
    * Returns the data chunk's header offset, or −1 if absent,
    * truncated, or any chunk size is negative.
    */
  private def dataChunkOffset(b: Array[Byte]): Int = {
    var off = 12L
    while (off + 8 <= b.length) {
      val o = off.toInt
      if (b(o) == 'd' && b(o + 1) == 'a' &&
        b(o + 2) == 't' && b(o + 3) == 'a') return o
      val sz = le32(b, o + 4)
      if (sz < 0) return -1
      off += 8L + sz + (sz & 1)
    }
    -1
  }

  /** The data chunk's payload offset and byte count, validated — the
    * ONE bound both the gates and the decoders consult (they must
    * agree, or a gate-passing payload can fault its decoder — the
    * class the round-13 review flagged). Left = decoder fault message.
    */
  private def dataChunk(b: Array[Byte]): Either[String, (Int, Int)] = {
    val o = dataChunkOffset(b)
    if (o < 0) Left("no data chunk")
    else {
      val sz = le32(b, o + 4)
      if (sz < 0 || o + 8L + sz > b.length)
        Left(s"truncated WAV data chunk: claims $sz bytes, " +
          s"payload has ${b.length - o - 8}")
      else Right((o + 8, sz))
    }
  }

  /** True iff `b` is a canonical 16-bit PCM WAV whose data chunk is
    * present and complete — the safe-dispatch twin of
    * [[isCompleteBmp24]] for sample-reading paths.
    */
  def isCompletePcm16(b: Array[Byte]): Boolean =
    detect(b) == "wav" && le16(b, 34) == 16 && dataChunk(b).isRight

  /** True iff `b` is a GVID container whose frame count and every
    * frame length are in-bounds — the safe-dispatch twin of
    * [[isCompleteBmp24]] for frame-walking paths.
    */
  def isCompleteGvid(b: Array[Byte]): Boolean =
    b.length >= 8 && b(0) == 'G' && b(1) == 'V' &&
      b(2) == 'I' && b(3) == 'D' && {
        val n = le32(b, 4)
        var ok = n >= 0 && n.toLong <= (b.length - 8L) / 4L
        var off = 8
        var i = 0
        while (ok && i < n) {
          if (off + 4 > b.length) ok = false
          else {
            val len = le32(b, off)
            if (len < 0 || off + 4L + len > b.length) ok = false
            else off += 4 + len
          }
          i += 1
        }
        ok
      }

  /** REAL 24-bit BMP pixel decode: un-flips the bottom-up rows, strips
    * row padding, returns top-down row-major BGR bytes.
    */
  /** True iff `b` is a 24bpp BMP whose pixel array is actually
    * present and complete — the dispatch guard for pixel-reading
    * paths ([[synthesizeBmp]] header-only payloads and truncated
    * uploads carry a valid header but no/partial pixels, and must
    * route to the header-metadata path instead of crashing a task).
    */
  def isCompleteBmp24(b: Array[Byte]): Boolean =
    detect(b) == "bmp" && {
      val h = parseBmp(b)
      val off = le32(b, 10)
      val rowBytes = ((3L * h.width + 3) / 4) * 4
      // multiplyExact: width AND height near 2^31 wrap even a Long
      // product (~1.4e19 > 2^63), landing the wrapped total back
      // under b.length — exactEnd turns that into None, not a pass
      h.bitsPerPixel == 24 && h.width > 0 && h.height > 0 &&
        off >= 54 && exactEnd(off.toLong, rowBytes, h.height)
          .exists(_ <= b.length)
    }

  /** off + rowBytes·height without wrap: None on Long overflow. */
  private def exactEnd(off: Long, rowBytes: Long, height: Int): Option[Long] =
    try Some(Math.addExact(off, Math.multiplyExact(rowBytes, height.toLong)))
    catch { case _: ArithmeticException => None }

  def decodeBmp24(b: Array[Byte]): Bmp24 = {
    require(detect(b) == "bmp", "not a BMP payload")
    val h = parseBmp(b)
    require(h.bitsPerPixel == 24, s"not 24bpp: ${h.bitsPerPixel}")
    val off = le32(b, 10)
    // Long row stride: a hostile header width above ~715M wraps
    // 3*width negative in Int BEFORE any .toLong, sneaking past the
    // truncation require below only to die in the array math. The
    // payload-length require then bounds everything back to Int.
    val rowBytesL = ((3L * h.width + 3) / 4) * 4
    // Truncation is a data fault, not a code fault — fail with a
    // clear message instead of an ArrayIndexOutOfBounds mid-row.
    // exactEnd: a width·height pair near 2^31 each wraps even the
    // Long product — overflow means the payload cannot possibly hold
    // the pixels, so it reports as truncation, never as a crash.
    require(h.width > 0 && h.height > 0,
      s"non-positive BMP dimensions: ${h.width}x${h.height}")
    val end = exactEnd(off.toLong, rowBytesL, h.height)
    require(off >= 54 && end.exists(_ <= b.length),
      s"truncated BMP24: pixel array needs ${end.map(_.toString)
        .getOrElse(">2^63")} bytes, payload has ${b.length}")
    val rowBytes = rowBytesL.toInt
    val out = new Array[Int](3 * h.width * h.height)
    var y = 0
    while (y < h.height) {
      val row = off + (h.height - 1 - y) * rowBytes
      var i = 0
      while (i < 3 * h.width) {
        out(3 * y * h.width + i) = b(row + i) & 0xff
        i += 1
      }
      y += 1
    }
    Bmp24(h.width, h.height, out)
  }

  /** Minimal video container ("GVID"): magic + u32le frame count,
    * then length-prefixed frames (any embedded codec — here BMP24).
    * The 1→N decode shape of real video without an external codec.
    */
  /** Unified pixel decode over the formats with a REAL decoder: 24-bit
    * BMP (here), baseline sequential JPEG ([[JpegCodec]]), PNG
    * ([[PngCodec]] — all color types, Adam7, zlib inflate) and GIF
    * ([[GifCodec]] — LZW, interlace, first frame); grayscale expands
    * to B = G = R. One return shape for every pixel consumer.
    */
  def decodeImage(b: Array[Byte]): Bmp24 = detect(b) match {
    case "bmp" => decodeBmp24(b)
    case "jpeg" => JpegCodec.decodeBaseline(b)
    case "png" => PngCodec.decode(b)
    case "gif" => GifCodec.decode(b)
    case "webp" => VP8LCodec.decode(b)
    case other => throw new IllegalArgumentException(
      s"no pixel decoder for format '$other'")
  }

  /** Guard for [[decodeImage]] on untrusted corpus bytes. The JPEG and
    * PNG guards are structural (they do not decode entropy data), so a
    * guard-passing stream can still fail decode with
    * IllegalArgumentException — consumers of untrusted bytes must
    * catch it and fall back.
    */
  def isDecodableImage(b: Array[Byte]): Boolean =
    detect(b) match {
      case "bmp" => isCompleteBmp24(b)
      case "jpeg" => JpegCodec.isBaselineDecodable(b)
      case "png" => PngCodec.isDecodable(b)
      case "gif" => GifCodec.isDecodable(b)
      case "webp" => VP8LCodec.isDecodable(b)
      case _ => false
    }

  def synthesizeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 8 + frames.map(4 + _.length).sum
    val b = new Array[Byte](total)
    b(0) = 'G'; b(1) = 'V'; b(2) = 'I'; b(3) = 'D'
    putLe32(b, 4, frames.length)
    var off = 8
    frames.foreach { f =>
      putLe32(b, off, f.length)
      System.arraycopy(f, 0, b, off + 4, f.length)
      off += 4 + f.length
    }
    b
  }

  def decodeVideoFrames(b: Array[Byte]): Array[Array[Byte]] = {
    require(b.length >= 8 && b(0) == 'G' && b(1) == 'V' &&
      b(2) == 'I' && b(3) == 'D', "not a GVID payload")
    val n = le32(b, 4)
    // The embedded count/lengths are untrusted corpus bytes: a
    // truncated or corrupt container must fail with a clear message
    // (or a bounded allocation), never AIOOBE / NegativeArraySize /
    // a 2³¹-slot allocation from a bogus count.
    require(n >= 0 && n.toLong <= (b.length - 8L) / 4L,
      s"corrupt GVID frame count: $n for ${b.length}-byte payload")
    val out = new Array[Array[Byte]](n)
    var off = 8
    var i = 0
    while (i < n) {
      require(off + 4 <= b.length, s"truncated GVID: frame $i length")
      val len = le32(b, off)
      require(len >= 0 && off + 4L + len <= b.length,
        s"truncated GVID: frame $i claims $len bytes past payload end")
      out(i) = java.util.Arrays.copyOfRange(b, off + 4, off + 4 + len)
      off += 4 + len
      i += 1
    }
    out
  }

  /** Canonical PCM WAV with REAL 16-bit LE mono sample data — the
    * payload the energy extractor decodes back byte-for-byte.
    */
  def synthesizeWavPcm16(
      sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataBytes = samples.length * 2
    val b = new Array[Byte](44 + dataBytes)
    System.arraycopy(synthesizeWav(1, sampleRate, 16), 0, b, 0, 44)
    putLe32(b, 4, 36 + dataBytes) // RIFF chunk size
    putLe32(b, 40, dataBytes)     // data chunk size
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      b(44 + 2 * i) = (v & 0xff).toByte
      b(45 + 2 * i) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    b
  }

  /** REAL PCM decode: walk to the `data` chunk (chunk-walking, not a
    * fixed offset — a correct reader must survive extra chunks) and
    * return the 16-bit LE mono samples as Ints in [−32768, 32767].
    */
  def decodePcm16(b: Array[Byte]): Array[Int] = {
    require(detect(b) == "wav", "not a WAV payload")
    require(le16(b, 34) == 16, s"not 16-bit PCM: ${le16(b, 34)}")
    // Long-cursor walk (dataChunkOffset) + the shared dataChunk bound:
    // corrupt chunk sizes must hit a loud IllegalArgumentException,
    // not an AIOOBE from a wrapped Int cursor re-entering the buffer.
    val (dataOff, dataBytes) = dataChunk(b).fold(
      m => throw new IllegalArgumentException(m), identity)
    val n = dataBytes / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = ((b(dataOff + 2 * i) & 0xff) |
        (b(dataOff + 1 + 2 * i) << 8)).toShort.toInt
      i += 1
    }
    out
  }

  /** G.711 μ-law byte → 16-bit linear PCM (ITU-T G.711 expansion). */
  def g711UlawToPcm(code: Int): Int = {
    val v = ~code & 0xff
    var t = ((v & 0x0f) << 3) + 0x84
    t <<= (v & 0x70) >> 4
    if ((v & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law byte → 16-bit linear PCM (ITU-T G.711 expansion). */
  def g711AlawToPcm(code: Int): Int = {
    val a = (code ^ 0x55) & 0xff
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0f) << 4
    if (seg == 0) t += 8
    else { t += 0x108; t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  /** Canonical mono G.711 WAV (format tag 7 = μ-law, 6 = A-law,
    * 8 bits/sample) with REAL code bytes — the payload
    * [[decodeG711]] expands back to linear PCM.
    */
  def synthesizeWavG711(
      sampleRate: Int, codes: Array[Int], ulaw: Boolean): Array[Byte] = {
    val b = new Array[Byte](44 + codes.length)
    System.arraycopy(synthesizeWav(1, sampleRate, 8), 0, b, 0, 44)
    putLe16(b, 20, if (ulaw) 7 else 6) // WAVE_FORMAT_MULAW / ALAW
    putLe32(b, 4, 36 + codes.length)
    putLe32(b, 40, codes.length)
    var i = 0
    while (i < codes.length) {
      b(44 + i) = (codes(i) & 0xff).toByte
      i += 1
    }
    b
  }

  /** REAL G.711 decode: walk to the `data` chunk and expand each
    * 8-bit μ-law/A-law code byte to a 16-bit linear sample. Same
    * untrusted-bytes contract as [[decodePcm16]].
    */
  def decodeG711(b: Array[Byte]): Array[Int] = {
    require(detect(b) == "wav", "not a WAV payload")
    val tag = le16(b, 20)
    require(tag == 6 || tag == 7, s"not a G.711 WAV: format tag $tag")
    require(le16(b, 34) == 8, s"G.711 is 8-bit: ${le16(b, 34)}")
    val ulaw = tag == 7
    val (dataOff, dataBytes) = dataChunk(b).fold(
      m => throw new IllegalArgumentException(m), identity)
    val out = new Array[Int](dataBytes)
    var i = 0
    while (i < dataBytes) {
      val c = b(dataOff + i) & 0xff
      out(i) = if (ulaw) g711UlawToPcm(c) else g711AlawToPcm(c)
      i += 1
    }
    out
  }

  /** True iff `b` is a canonical 8-bit G.711 WAV whose data chunk is
    * complete — the safe-dispatch twin of [[isCompletePcm16]].
    */
  def isCompleteG711(b: Array[Byte]): Boolean =
    detect(b) == "wav" &&
      (le16(b, 20) == 6 || le16(b, 20) == 7) && le16(b, 34) == 8 &&
      dataChunk(b).isRight

  /** Unified WAV sample decode: 16-bit PCM or 8-bit G.711 (μ-law /
    * A-law), both to linear PCM ints — one return shape for every
    * sample consumer, mirroring [[decodeImage]].
    */
  def decodeAudio(b: Array[Byte]): Array[Int] = {
    require(detect(b) == "wav", "not a WAV payload")
    le16(b, 20) match {
      case 1 => decodePcm16(b)
      case 6 | 7 => decodeG711(b)
      case other => throw new IllegalArgumentException(
        s"no sample decoder for WAV format tag $other")
    }
  }

  /** Guard for [[decodeAudio]] on untrusted corpus bytes. */
  def isDecodableAudio(b: Array[Byte]): Boolean =
    detect(b) == "wav" && (le16(b, 20) match {
      case 1 => isCompletePcm16(b)
      case 6 | 7 => isCompleteG711(b)
      case _ => false
    })

  /** Minimal spec-valid PNG: signature + IHDR chunk (with a real
    * CRC-32 over type+data — readers that check it must accept the
    * payload) and an IEND chunk. No IDAT — header-only payload, the
    * metadata path never inflates pixels.
    */
  def synthesizePng(
      width: Int, height: Int, bitDepth: Int = 8,
      colorType: Int = 2): Array[Byte] = {
    val b = new Array[Byte](8 + 25 + 12)
    PngSig.copyToArray(b, 0)
    putBe32(b, 8, 13)        // IHDR data length
    b(12) = 'I'; b(13) = 'H'; b(14) = 'D'; b(15) = 'R'
    putBe32(b, 16, width)
    putBe32(b, 20, height)
    b(24) = bitDepth.toByte
    b(25) = colorType.toByte // compression/filter/interlace stay 0
    val crc = new java.util.zip.CRC32
    crc.update(b, 12, 17)    // chunk type + data
    putBe32(b, 29, crc.getValue.toInt)
    putBe32(b, 33, 0)        // IEND data length
    b(37) = 'I'; b(38) = 'E'; b(39) = 'N'; b(40) = 'D'
    val crc2 = new java.util.zip.CRC32
    crc2.update(b, 37, 4)
    putBe32(b, 41, crc2.getValue.toInt)
    b
  }

  /** Minimal GIF89a: header + logical screen descriptor + global
    * color table of 2^gctBits zeroed entries + trailer. No image
    * descriptor — header-only payload.
    */
  def synthesizeGif(
      width: Int, height: Int, gctBits: Int = 8): Array[Byte] = {
    require(gctBits >= 1 && gctBits <= 8, s"gctBits in 1..8: $gctBits")
    val b = new Array[Byte](13 + 3 * (1 << gctBits) + 1)
    b(0) = 'G'; b(1) = 'I'; b(2) = 'F'; b(3) = '8'; b(4) = '9'; b(5) = 'a'
    putLe16(b, 6, width)
    putLe16(b, 8, height)
    // GCT present, color resolution = gctBits bits/primary, size field
    b(10) = (0x80 | ((gctBits - 1) << 4) | (gctBits - 1)).toByte
    b(11) = 0                       // background color index
    b(12) = 0                       // no pixel aspect ratio
    b(b.length - 1) = 0x3b          // trailer
    b
  }

  /** Minimal WebP. `lossless = false`: a VP8X extended-header file
    * (30 bytes, canvas dimensions only). `lossless = true`: a VP8L
    * chunk whose 5-byte bitstream header really bit-packs the
    * dimensions (14+14 bits, no alpha, version 0) plus the RIFF pad
    * byte. Neither carries coded pixels — header-only payloads.
    */
  def synthesizeWebp(
      width: Int, height: Int, lossless: Boolean = false): Array[Byte] = {
    require(width >= 1 && height >= 1 &&
      (lossless && width <= 0x4000 && height <= 0x4000 ||
        !lossless && width <= 0x1000000 && height <= 0x1000000),
      s"dimensions out of range: ${width}x$height lossless=$lossless")
    if (!lossless) {
      val b = new Array[Byte](30)
      b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
      putLe32(b, 4, 22)             // RIFF payload: WEBP + chunk hdr + 10
      b(8) = 'W'; b(9) = 'E'; b(10) = 'B'; b(11) = 'P'
      b(12) = 'V'; b(13) = 'P'; b(14) = '8'; b(15) = 'X'
      putLe32(b, 16, 10)
      // flags + reserved stay 0
      putLe24(b, 24, width - 1)
      putLe24(b, 27, height - 1)
      b
    } else {
      val b = new Array[Byte](26)   // 5-byte header + pad to even
      b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
      putLe32(b, 4, 18)             // WEBP + chunk hdr + 5 + pad
      b(8) = 'W'; b(9) = 'E'; b(10) = 'B'; b(11) = 'P'
      b(12) = 'V'; b(13) = 'P'; b(14) = '8'; b(15) = 'L'
      putLe32(b, 16, 5)
      b(20) = 0x2f
      putLe32(b, 21, (width - 1) | ((height - 1) << 14))
      b
    }
  }

  /** Minimal JPEG/JFIF header stream: SOI, APP0 (JFIF 1.1), SOF0
    * (baseline, 8-bit), EOI — no scan data (the header walk in
    * [[parseJpeg]] is the read path).
    */
  def synthesizeJpeg(
      width: Int, height: Int, components: Int = 3): Array[Byte] = {
    val sof = 10 + 3 * components
    val b = new Array[Byte](2 + 18 + 2 + sof + 2)
    var o = 0
    b(o) = 0xff.toByte; b(o + 1) = 0xd8.toByte; o += 2      // SOI
    b(o) = 0xff.toByte; b(o + 1) = 0xe0.toByte              // APP0
    putBe16(b, o + 2, 16)
    b(o + 4) = 'J'; b(o + 5) = 'F'; b(o + 6) = 'I'; b(o + 7) = 'F'
    b(o + 8) = 0
    b(o + 9) = 1; b(o + 10) = 1                             // version 1.1
    b(o + 11) = 0                                           // no density units
    putBe16(b, o + 12, 1); putBe16(b, o + 14, 1)            // aspect 1:1
    o += 18
    b(o) = 0xff.toByte; b(o + 1) = 0xc0.toByte              // SOF0
    putBe16(b, o + 2, sof - 2)
    b(o + 4) = 8                                            // precision
    putBe16(b, o + 5, height)
    putBe16(b, o + 7, width)
    b(o + 9) = components.toByte
    var c = 0
    while (c < components) {
      b(o + 10 + 3 * c) = (c + 1).toByte                    // component id
      b(o + 11 + 3 * c) = 0x11                              // 1x1 sampling
      b(o + 12 + 3 * c) = 0                                 // quant table 0
      c += 1
    }
    o += sof
    b(o) = 0xff.toByte; b(o + 1) = 0xd9.toByte              // EOI
    b
  }
}
