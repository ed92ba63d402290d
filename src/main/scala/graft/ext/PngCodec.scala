package graft.ext

import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

/** REAL PNG codec — encode and pixel decode over the JDK's zlib
  * (`java.util.zip`), no external libraries.
  *
  * Decode supports the full baseline still-image matrix a web corpus
  * actually contains: color types 0 (gray), 2 (RGB), 3 (palette),
  * 4 (gray+alpha), 6 (RGBA); bit depths 8 everywhere plus 1/2/4 for
  * gray and palette; interlace methods 0 (none) and 1 (Adam7); all
  * five scanline filters (None/Sub/Up/Average/Paeth). 16-bit depth is
  * rejected with a clear message. Output is [[MediaCodec.Bmp24]]
  * (top-down interleaved BGR; gray expands to B = G = R; alpha is
  * dropped) — the same shape every pixel consumer already takes from
  * the BMP and JPEG decoders.
  *
  * PNG is lossless, so `decode(encode(f)) == f` EXACTLY — which is
  * what makes the format DuckDB-oracle-able end to end (the oracle
  * recomputes the generator formula; the Spark side must survive a
  * real deflate→filter→interlace byte round trip to match).
  *
  * Untrusted-bytes contract (same as [[JpegCodec.decodeBaseline]]):
  * every corrupt, truncated, or hostile stream surfaces as
  * IllegalArgumentException — never an AIOOBE/OOM that kills a task —
  * and `maxPixels` caps the decode allocation before any inflate
  * happens. Chunk CRCs are verified.
  *
  * Reference behavior anchor: the reference pipeline treats media as
  * opaque payloads (no decode); this codec is part of the [EXT]
  * multimodal surface (SURVEY §2.9).
  */
object PngCodec {

  private val Sig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  // Adam7 pass geometry (PNG spec §8.2).
  private val XStart = Array(0, 4, 0, 2, 0, 1, 0)
  private val YStart = Array(0, 0, 4, 0, 2, 0, 1)
  private val XStep = Array(8, 8, 4, 4, 2, 2, 1)
  private val YStep = Array(8, 8, 8, 4, 4, 2, 2)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"PNG: $msg")

  /** ceil(width·channels·depth / 8) bytes per unfiltered scanline. */
  private def rowBytes(width: Int, channels: Int, depth: Int): Int =
    ((width.toLong * channels * depth + 7) / 8).toInt

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** The passes of the image: (xStart, yStart, xStep, yStep, w, h)
    * per pass — one full-frame pass when not interlaced, the
    * non-empty Adam7 passes otherwise.
    */
  private def passes(
      width: Int, height: Int,
      interlaced: Boolean): Seq[(Int, Int, Int, Int, Int, Int)] =
    if (!interlaced) Seq((0, 0, 1, 1, width, height))
    else (0 until 7).flatMap { p =>
      val w = (width - XStart(p) + XStep(p) - 1) / XStep(p)
      val h = (height - YStart(p) + YStep(p) - 1) / YStep(p)
      if (w > 0 && h > 0) Some((XStart(p), YStart(p), XStep(p), YStep(p), w, h))
      else None
    }

  private def chunk(
      out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val head = new Array[Byte](8)
    putBe32(head, 0, data.length)
    head(4) = typ.charAt(0).toByte; head(5) = typ.charAt(1).toByte
    head(6) = typ.charAt(2).toByte; head(7) = typ.charAt(3).toByte
    out.write(head)
    out.write(data)
    val crc = new CRC32
    crc.update(head, 4, 4)
    crc.update(data)
    val tail = new Array[Byte](4)
    putBe32(tail, 0, crc.getValue.toInt)
    out.write(tail)
  }

  private def deflateAll(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(raw)
      d.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Filter one scanline in place into `dst` (type byte NOT included):
    * `dst(i) = raw(i) − predictor(ft)` mod 256.
    */
  private def filterRow(
      ft: Int, raw: Array[Byte], prior: Array[Byte], bpp: Int,
      dst: Array[Byte]): Unit = {
    var i = 0
    while (i < raw.length) {
      val left = if (i >= bpp) raw(i - bpp) & 0xff else 0
      val up = prior(i) & 0xff
      val ul = if (i >= bpp) prior(i - bpp) & 0xff else 0
      val pred = ft match {
        case 1 => left
        case 2 => up
        case 3 => (left + up) >> 1
        case 4 => paeth(left, up, ul)
        case _ => 0
      }
      dst(i) = (((raw(i) & 0xff) - pred) & 0xff).toByte
      i += 1
    }
  }

  /** Encode 8-bit-depth pixels as a real spec-valid PNG.
    *
    * `channels`: 1 = grayscale (color type 0), 2 = gray+alpha (4),
    * 3 = RGB (2), 4 = RGBA (6). `pixel(x, y, c)` is in PNG sample
    * order (RGB: 0 = R, 1 = G, 2 = B; the LAST channel is alpha for
    * types 4/6) — note this is the reverse of [[MediaCodec.Bmp24]]'s
    * BGR order. `filterMode` −1 cycles the filter type 0→4 per
    * scanline (exercises every unfilter path in one payload);
    * 0..4 fixes it. `interlaced` emits Adam7.
    */
  def encode(
      width: Int, height: Int, channels: Int,
      pixel: (Int, Int, Int) => Int,
      filterMode: Int = -1,
      interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(channels >= 1 && channels <= 4, s"bad channel count $channels")
    require(filterMode >= -1 && filterMode <= 4, s"bad filter $filterMode")
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
    }
    val raw = new java.io.ByteArrayOutputStream(
      height * (1 + width * channels) + 64)
    var globalRow = 0
    passes(width, height, interlaced).foreach {
      case (x0, y0, dx, dy, pw, ph) =>
        val rb = pw * channels
        var prior = new Array[Byte](rb)
        val cur = new Array[Byte](rb)
        val filtered = new Array[Byte](rb)
        var r = 0
        while (r < ph) {
          val y = y0 + r * dy
          var px = 0
          while (px < pw) {
            val x = x0 + px * dx
            var c = 0
            while (c < channels) {
              cur(px * channels + c) = (pixel(x, y, c) & 0xff).toByte
              c += 1
            }
            px += 1
          }
          val ft = if (filterMode == -1) globalRow % 5 else filterMode
          filterRow(ft, cur, prior, channels, filtered)
          raw.write(ft)
          raw.write(filtered)
          prior = cur.clone()
          globalRow += 1
          r += 1
        }
    }
    val out = new java.io.ByteArrayOutputStream
    out.write(Sig)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width)
    putBe32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    ihdr(12) = if (interlaced) 1 else 0 // compression=0, filter=0
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", deflateAll(raw.toByteArray))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Encode an indexed-color (type 3) PNG at bit depth 1/2/4/8.
    * `palette` holds packed 0xRRGGBB entries; `index(x, y)` must be
    * < palette.length.
    */
  def encodeIndexed(
      width: Int, height: Int, palette: Array[Int],
      index: (Int, Int) => Int,
      bitDepth: Int = 8,
      interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(Seq(1, 2, 4, 8).contains(bitDepth), s"bad depth $bitDepth")
    require(palette.nonEmpty && palette.length <= (1 << bitDepth),
      s"palette size ${palette.length} vs depth $bitDepth")
    val raw = new java.io.ByteArrayOutputStream
    var globalRow = 0
    passes(width, height, interlaced).foreach {
      case (x0, y0, dx, dy, pw, ph) =>
        val rb = rowBytes(pw, 1, bitDepth)
        var prior = new Array[Byte](rb)
        val cur = new Array[Byte](rb)
        val filtered = new Array[Byte](rb)
        var r = 0
        while (r < ph) {
          java.util.Arrays.fill(cur, 0.toByte)
          val y = y0 + r * dy
          var px = 0
          while (px < pw) {
            val v = index(x0 + px * dx, y)
            val bitPos = px * bitDepth
            cur(bitPos >> 3) = (cur(bitPos >> 3) |
              (v << (8 - bitDepth - (bitPos & 7)))).toByte
            px += 1
          }
          val ft = globalRow % 5
          filterRow(ft, cur, prior, 1, filtered)
          raw.write(ft)
          raw.write(filtered)
          prior = cur.clone()
          globalRow += 1
          r += 1
        }
    }
    val out = new java.io.ByteArrayOutputStream
    out.write(Sig)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width)
    putBe32(ihdr, 4, height)
    ihdr(8) = bitDepth.toByte
    ihdr(9) = 3
    ihdr(12) = if (interlaced) 1 else 0
    chunk(out, "IHDR", ihdr)
    val plte = new Array[Byte](3 * palette.length)
    var i = 0
    while (i < palette.length) {
      plte(3 * i) = ((palette(i) >> 16) & 0xff).toByte
      plte(3 * i + 1) = ((palette(i) >> 8) & 0xff).toByte
      plte(3 * i + 2) = (palette(i) & 0xff).toByte
      i += 1
    }
    chunk(out, "PLTE", plte)
    chunk(out, "IDAT", deflateAll(raw.toByteArray))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Parsed structural state shared by [[decode]] and
    * [[isDecodable]]: IHDR fields, palette, concatenated IDAT.
    */
  private final case class Parsed(
      width: Int, height: Int, depth: Int, colorType: Int,
      interlaced: Boolean, palette: Array[Byte], idat: Array[Byte])

  /** Walk the chunk stream with full bounds + CRC verification and
    * IHDR validation. Every fault is an IllegalArgumentException.
    */
  private def parseChunks(b: Array[Byte]): Parsed = {
    require(MediaCodec.detect(b) == "png", "not a PNG payload")
    var pos = 8
    var w = 0; var h = 0; var depth = 0; var ct = 0; var interlaced = false
    var sawIhdr = false; var sawIend = false
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream
    var sawIdat = false
    while (!sawIend) {
      if (pos + 8 > b.length) fail("truncated chunk header")
      val len = be32(b, pos)
      if (len < 0 || pos + 12L + len > b.length)
        fail(s"chunk length $len overruns ${b.length}-byte payload")
      val crc = new CRC32
      crc.update(b, pos + 4, 4 + len)
      if (crc.getValue.toInt != be32(b, pos + 8 + len))
        fail("chunk CRC mismatch")
      val typ = new String(b, pos + 4, 4, "ISO-8859-1")
      typ match {
        case "IHDR" =>
          if (sawIhdr) fail("duplicate IHDR")
          if (len != 13) fail(s"IHDR length $len")
          w = be32(b, pos + 8); h = be32(b, pos + 12)
          depth = b(pos + 16) & 0xff; ct = b(pos + 17) & 0xff
          if ((b(pos + 18) & 0xff) != 0) fail("unknown compression method")
          if ((b(pos + 19) & 0xff) != 0) fail("unknown filter method")
          val il = b(pos + 20) & 0xff
          if (il > 1) fail(s"unknown interlace method $il")
          interlaced = il == 1
          sawIhdr = true
        case "PLTE" =>
          if (len == 0 || len % 3 != 0 || len > 768) fail(s"PLTE length $len")
          palette = java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + len)
        case "IDAT" =>
          idat.write(b, pos + 8, len)
          sawIdat = true
        case "IEND" =>
          if (len != 0) fail(s"IEND length $len")
          sawIend = true
        case other =>
          // Ancillary chunks (lowercase first letter: tEXt, tRNS,
          // gAMA, …) are safely skippable; an UNKNOWN CRITICAL chunk
          // changes pixel meaning and must reject, per spec §5.4.
          if ((other.charAt(0) & 0x20) == 0)
            fail(s"unknown critical chunk $other")
      }
      pos += 12 + len
    }
    if (!sawIhdr) fail("missing IHDR")
    if (!sawIdat) fail("no IDAT chunk (header-only payload)")
    if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
    if (depth == 16) fail("16-bit depth unsupported")
    val comboOk = (ct, depth) match {
      case (0, 1) | (0, 2) | (0, 4) | (0, 8) => true
      case (2, 8) | (4, 8) | (6, 8) => true
      case (3, 1) | (3, 2) | (3, 4) | (3, 8) => true
      case _ => false
    }
    if (!comboOk) fail(s"color type $ct / depth $depth unsupported")
    if (ct == 3 && palette == null) fail("palette image without PLTE")
    Parsed(w, h, depth, ct, interlaced,
      if (palette == null) Array.emptyByteArray else palette, idat.toByteArray)
  }

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
  }

  /** Inflate the IDAT stream into EXACTLY `expected` bytes; short,
    * long, and malformed zlib streams all fail as data faults.
    */
  private def inflateExact(idat: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater
    try {
      inf.setInput(idat)
      val out = new Array[Byte](expected)
      var total = 0
      try {
        while (total < expected && !inf.finished()) {
          val n = inf.inflate(out, total, expected - total)
          if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
            fail("truncated pixel data (zlib stream incomplete)")
          total += n
        }
      } catch {
        case e: DataFormatException =>
          fail(s"malformed zlib stream: ${e.getMessage}")
      }
      if (total < expected)
        fail(s"pixel data short: $total of $expected bytes")
      // Anything left beyond the exact pixel payload is corruption.
      val probe = new Array[Byte](1)
      if (!inf.finished() && inf.inflate(probe) > 0)
        fail("pixel data overruns the image dimensions")
      out
    } finally inf.end()
  }

  /** Decode a PNG to 3-channel pixels ([[MediaCodec.Bmp24]] layout).
    * Throws IllegalArgumentException on unsupported or corrupt
    * streams — gate with [[isDecodable]] on untrusted bytes.
    * `maxPixels` caps the decode allocation before inflate.
    */
  def decode(
      b: Array[Byte], maxPixels: Int = 1 << 25): MediaCodec.Bmp24 =
    try decode0(b, maxPixels)
    catch {
      case e: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException(
          "PNG: truncated or corrupt stream", e)
      case e: NegativeArraySizeException =>
        throw new IllegalArgumentException(
          "PNG: corrupt stream (negative size)", e)
    }

  private def decode0(b: Array[Byte], maxPixels: Int): MediaCodec.Bmp24 = {
    val p = parseChunks(b)
    if (p.width.toLong * p.height > maxPixels)
      fail(s"${p.width}x${p.height} exceeds the $maxPixels-pixel decode cap")
    val ch = channelsOf(p.colorType)
    val pss = passes(p.width, p.height, p.interlaced)
    val expected = pss.map { case (_, _, _, _, pw, ph) =>
      ph.toLong * (1 + rowBytes(pw, ch, p.depth))
    }.sum
    if (expected > Int.MaxValue) fail("pixel payload exceeds 2^31 bytes")
    val raw = inflateExact(p.idat, expected.toInt)
    val out = new Array[Int](3 * p.width * p.height)
    val maxSample = (1 << p.depth) - 1
    val nPal = p.palette.length / 3
    var off = 0
    pss.foreach { case (x0, y0, dx, dy, pw, ph) =>
      val rb = rowBytes(pw, ch, p.depth)
      val bpp = math.max(1, ch * p.depth / 8)
      var prior = new Array[Int](rb) // zeros for the pass's first row
      val cur = new Array[Int](rb)
      var r = 0
      while (r < ph) {
        val ft = raw(off) & 0xff
        if (ft > 4) fail(s"bad filter type $ft")
        off += 1
        var i = 0
        while (i < rb) {
          val x = raw(off + i) & 0xff
          val left = if (i >= bpp) cur(i - bpp) else 0
          val up = prior(i)
          val ul = if (i >= bpp) prior(i - bpp) else 0
          cur(i) = (x + (ft match {
            case 1 => left
            case 2 => up
            case 3 => (left + up) >> 1
            case 4 => paeth(left, up, ul)
            case _ => 0
          })) & 0xff
          i += 1
        }
        off += rb
        // samples → BGR at the pass's image coordinates
        val y = y0 + r * dy
        var px = 0
        while (px < pw) {
          val x = x0 + px * dx
          def sample(c: Int): Int =
            if (p.depth == 8) cur(px * ch + c)
            else {
              val bitPos = (px * ch + c) * p.depth
              (cur(bitPos >> 3) >> (8 - p.depth - (bitPos & 7))) & maxSample
            }
          val o = 3 * (y * p.width + x)
          p.colorType match {
            case 0 | 4 =>
              // low-depth gray scales to full range (spec §7.1)
              val g =
                if (p.depth == 8) sample(0)
                else sample(0) * 255 / maxSample
              out(o) = g; out(o + 1) = g; out(o + 2) = g
            case 2 | 6 =>
              out(o) = sample(2); out(o + 1) = sample(1); out(o + 2) = sample(0)
            case 3 =>
              val idx = sample(0)
              if (idx >= nPal) fail(s"palette index $idx of $nPal entries")
              out(o) = p.palette(3 * idx + 2) & 0xff
              out(o + 1) = p.palette(3 * idx + 1) & 0xff
              out(o + 2) = p.palette(3 * idx) & 0xff
          }
          px += 1
        }
        prior = cur.clone() // cur is reused as the next row's buffer
        r += 1
      }
    }
    MediaCodec.Bmp24(p.width, p.height, out)
  }

  /** Guard for [[decode]] on untrusted corpus bytes: structural walk
    * (chunk bounds, CRCs, supported IHDR combo, PLTE-if-palette, IDAT
    * present) without throwing. Like the JPEG guard this does NOT
    * inflate, so a structurally-valid stream with truncated zlib data
    * passes the guard and fails decode — pixel consumers must still
    * catch the decode's IllegalArgumentException.
    */
  def isDecodable(b: Array[Byte]): Boolean =
    try { parseChunks(b); true }
    catch {
      case _: IllegalArgumentException => false
      case _: ArrayIndexOutOfBoundsException => false
    }
}
