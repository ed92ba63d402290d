package graft.ext

/** REAL GIF codec — LZW pixel decode and a spec-valid encoder, no
  * external libraries.
  *
  * Decode renders the FIRST frame of a GIF87a/89a stream onto the
  * logical-screen canvas: variable-width LZW codes (3→12 bits, clear
  * and end-of-information handling, dictionary rebuild), global and
  * local color tables, the 4-pass row interlace, extension-block
  * skipping, and frames smaller than the logical screen composited
  * over the background color. Later frames of an animation are
  * ignored — the corpus-ingest contract is one representative image
  * per payload. Output is [[MediaCodec.Bmp24]] (top-down interleaved
  * BGR), the shape every pixel consumer already takes.
  *
  * Encode emits literal LZW codes with a clear code before the
  * dictionary would force a width increase — a spec-valid,
  * compression-free stream every conformant decoder (ImageIO
  * included) reads back bit-exactly; GIF is palette-lossless, so
  * `decode(encode(palette, idx)) == palette(idx)` EXACTLY, which
  * makes the format DuckDB-oracle-able like PNG.
  *
  * Untrusted-bytes contract (same as [[JpegCodec]]/[[PngCodec]]):
  * corrupt, truncated, or hostile streams surface as
  * IllegalArgumentException — never AIOOBE/OOM — and `maxPixels`
  * caps the canvas allocation before any LZW byte is read.
  *
  * Reference behavior anchor: the reference pipeline treats media as
  * opaque payloads (no decode); this codec is part of the [EXT]
  * multimodal surface (SURVEY §2.9).
  */
object GifCodec {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"GIF: $msg")

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  // 4-pass interlace row schedule (GIF89a spec appendix E).
  private val PassStart = Array(0, 4, 2, 1)
  private val PassStep = Array(8, 8, 4, 2)

  /** Encode an indexed-color GIF89a. `palette` holds packed 0xRRGGBB
    * entries (padded to the next power of two ≥ 2); `index(x, y)`
    * must be < palette.length. The LZW stream is literal-coded with
    * periodic clear codes — zero compression, full spec validity.
    */
  def encode(
      width: Int, height: Int, palette: Array[Int],
      index: (Int, Int) => Int,
      interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      s"bad dimensions ${width}x$height")
    require(palette.nonEmpty && palette.length <= 256,
      s"palette size ${palette.length}")
    // GCT size is a power of two in [2, 256]
    var gctBits = 1
    while ((1 << gctBits) < palette.length) gctBits += 1
    val gctEntries = 1 << gctBits
    val out = new java.io.ByteArrayOutputStream
    out.write("GIF89a".getBytes("ISO-8859-1"))
    // logical screen descriptor
    out.write(width & 0xff); out.write(width >> 8)
    out.write(height & 0xff); out.write(height >> 8)
    out.write(0x80 | ((gctBits - 1) << 4) | (gctBits - 1)) // GCT flag+sizes
    out.write(0) // background color index
    out.write(0) // pixel aspect ratio
    var i = 0
    while (i < gctEntries) {
      val e = if (i < palette.length) palette(i) else 0
      out.write((e >> 16) & 0xff); out.write((e >> 8) & 0xff)
      out.write(e & 0xff)
      i += 1
    }
    // image descriptor (frame == full screen)
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(width & 0xff); out.write(width >> 8)
    out.write(height & 0xff); out.write(height >> 8)
    out.write(if (interlaced) 0x40 else 0x00) // no LCT
    // LZW: literal codes at a fixed width, clear before it would grow
    val minCode = math.max(2, gctBits)
    out.write(minCode)
    val clearCode = 1 << minCode
    val eoiCode = clearCode + 1
    val codeWidth = minCode + 1
    // after a clear the dictionary holds eoi+1 entries; each literal
    // emitted adds one — emit the next clear while the width still
    // fits, i.e. after at most 2^codeWidth − eoi − 2 literals
    val literalsPerClear = (1 << codeWidth) - eoiCode - 2
    val data = new java.io.ByteArrayOutputStream
    var acc = 0L
    var nBits = 0
    def put(code: Int): Unit = {
      acc |= code.toLong << nBits // LSB-first packing
      nBits += codeWidth
      while (nBits >= 8) {
        data.write((acc & 0xff).toInt)
        acc >>= 8
        nBits -= 8
      }
    }
    put(clearCode)
    var emitted = 0
    val rows: Seq[Int] =
      if (!interlaced) 0 until height
      else (0 until 4).flatMap(p => PassStart(p) until height by PassStep(p))
    rows.foreach { y =>
      var x = 0
      while (x < width) {
        val v = index(x, y)
        require(v >= 0 && v < palette.length,
          s"index $v out of palette at ($x,$y)")
        put(v)
        emitted += 1
        if (emitted == literalsPerClear) { put(clearCode); emitted = 0 }
        x += 1
      }
    }
    put(eoiCode)
    if (nBits > 0) data.write((acc & 0xff).toInt)
    // sub-block the LZW bytes (≤255 each)
    val lzw = data.toByteArray
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Decode the first frame to 3-channel pixels
    * ([[MediaCodec.Bmp24]] layout). Throws IllegalArgumentException
    * on corrupt streams — gate with [[isDecodable]] on untrusted
    * bytes. `maxPixels` caps the canvas allocation.
    */
  def decode(
      b: Array[Byte], maxPixels: Int = 1 << 25): MediaCodec.Bmp24 =
    try decode0(b, maxPixels)
    catch {
      case e: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException(
          "GIF: truncated or corrupt stream", e)
      case e: NegativeArraySizeException =>
        throw new IllegalArgumentException(
          "GIF: corrupt stream (negative size)", e)
    }

  private def decode0(b: Array[Byte], maxPixels: Int): MediaCodec.Bmp24 = {
    require(MediaCodec.detect(b) == "gif", "not a GIF payload")
    val sw = le16(b, 6)
    val sh = le16(b, 8)
    if (sw <= 0 || sh <= 0) fail(s"bad screen dimensions ${sw}x$sh")
    if (sw.toLong * sh > maxPixels)
      fail(s"${sw}x$sh exceeds the $maxPixels-pixel decode cap")
    val packed = b(10) & 0xff
    val bgIndex = b(11) & 0xff
    var pos = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 3 * (1 << ((packed & 0x07) + 1))
      if (pos + n > b.length) fail("truncated global color table")
      gct = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n
    }
    // canvas primed with the background color (or black without a GCT)
    val out = new Array[Int](3 * sw * sh)
    if (gct != null && 3 * bgIndex + 2 < gct.length) {
      val bb = gct(3 * bgIndex + 2) & 0xff
      val bg = gct(3 * bgIndex + 1) & 0xff
      val br = gct(3 * bgIndex) & 0xff
      var i = 0
      while (i < out.length) { out(i) = bb; out(i + 1) = bg; out(i + 2) = br
        i += 3 }
    }
    // walk blocks to the first image descriptor
    var done = false
    while (!done) {
      if (pos >= b.length) fail("no image descriptor before end of data")
      (b(pos) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          var n = if (pos < b.length) b(pos) & 0xff else fail("truncated extension")
          while (n != 0) {
            pos += 1 + n
            if (pos >= b.length) fail("truncated extension sub-blocks")
            n = b(pos) & 0xff
          }
          pos += 1
        case 0x2c => done = true
        case 0x3b => fail("trailer before any image descriptor")
        case other => fail(f"unknown block type 0x$other%02x")
      }
    }
    if (pos + 10 > b.length) fail("truncated image descriptor")
    val left = le16(b, pos + 1)
    val top = le16(b, pos + 3)
    val fw = le16(b, pos + 5)
    val fh = le16(b, pos + 7)
    val fpacked = b(pos + 9) & 0xff
    pos += 10
    if (fw <= 0 || fh <= 0) fail(s"bad frame dimensions ${fw}x$fh")
    if (left + fw > sw || top + fh > sh)
      fail(s"frame ${fw}x$fh at ($left,$top) exceeds screen ${sw}x$sh")
    val interlaced = (fpacked & 0x40) != 0
    var table = gct
    if ((fpacked & 0x80) != 0) {
      val n = 3 * (1 << ((fpacked & 0x07) + 1))
      if (pos + n > b.length) fail("truncated local color table")
      table = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n
    }
    if (table == null) fail("no color table (neither global nor local)")
    val nColors = table.length / 3
    if (pos >= b.length) fail("truncated before LZW min code size")
    val minCode = b(pos) & 0xff
    pos += 1
    if (minCode < 2 || minCode > 11) fail(s"bad LZW min code size $minCode")

    // concatenate the LZW sub-blocks
    val lzw = new java.io.ByteArrayOutputStream
    var n = if (pos < b.length) b(pos) & 0xff else fail("truncated image data")
    while (n != 0) {
      if (pos + 1 + n > b.length) fail("truncated image sub-block")
      lzw.write(b, pos + 1, n)
      pos += 1 + n
      if (pos >= b.length) fail("missing image data terminator")
      n = b(pos) & 0xff
    }
    val stream = lzw.toByteArray

    // LZW decode straight into the frame's pixel index array
    val npx = fw * fh
    val indices = new Array[Int](npx)
    val clearCode = 1 << minCode
    val eoiCode = clearCode + 1
    val maxEntries = 4096
    // dictionary as (prefix link, appended index); roots are implicit
    val prefix = new Array[Int](maxEntries)
    val append = new Array[Int](maxEntries)
    var dictSize = eoiCode + 1
    var codeWidth = minCode + 1
    var acc = 0L
    var nBits = 0
    var bytePos = 0
    var written = 0
    var prev = -1
    val expand = new Array[Int](maxEntries) // scratch for one entry
    def emit(code: Int): Int = { // writes the entry's indices; returns its first index
      var c = code
      var len = 0
      while (c >= clearCode + 2) { // composite entry
        expand(len) = append(c); len += 1
        c = prefix(c)
      }
      if (c >= clearCode) fail(s"corrupt LZW entry chain at code $code")
      val first = c
      if (written + 1 + len > npx)
        fail("LZW output exceeds the frame's pixel count")
      if (first >= nColors) fail(s"color index $first of $nColors")
      indices(written) = first; written += 1
      var i = len - 1
      while (i >= 0) {
        if (expand(i) >= nColors) fail(s"color index ${expand(i)} of $nColors")
        indices(written) = expand(i); written += 1
        i -= 1
      }
      first
    }
    var eoi = false
    while (!eoi && written < npx) {
      while (nBits < codeWidth) {
        if (bytePos >= stream.length) fail("truncated LZW stream")
        acc |= (stream(bytePos) & 0xffL) << nBits
        bytePos += 1
        nBits += 8
      }
      val code = (acc & ((1 << codeWidth) - 1)).toInt
      acc >>= codeWidth
      nBits -= codeWidth
      if (code == clearCode) {
        dictSize = eoiCode + 1
        codeWidth = minCode + 1
        prev = -1
      } else if (code == eoiCode) {
        eoi = true
      } else if (prev == -1) {
        if (code >= clearCode) fail(s"first code $code after clear not a root")
        if (code >= nColors) fail(s"color index $code of $nColors")
        if (written >= npx) fail("LZW output exceeds the frame's pixel count")
        indices(written) = code; written += 1
        prev = code
      } else {
        if (code > dictSize || (code >= clearCode && code < eoiCode + 1))
          fail(s"LZW code $code out of range (dict $dictSize)")
        val first =
          if (code == dictSize) {
            // KwKwK case: entry = prev + firstIndex(prev)
            if (dictSize >= maxEntries) fail("LZW dictionary overflow")
            prefix(dictSize) = prev
            // firstIndex(prev): walk prev's chain
            var c = prev
            while (c >= clearCode + 2) c = prefix(c)
            append(dictSize) = c
            dictSize += 1
            emit(code)
          } else {
            val f = emit(code)
            if (dictSize < maxEntries) {
              prefix(dictSize) = prev
              append(dictSize) = f
              dictSize += 1
            }
            f
          }
        val _ = first
        prev = code
        if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
      }
    }
    if (written < npx)
      fail(s"LZW stream ended at $written of $npx pixels")

    // place frame rows (de-interlacing) onto the canvas
    val rows: Seq[Int] =
      if (!interlaced) 0 until fh
      else (0 until 4).flatMap(p => PassStart(p) until fh by PassStep(p))
    var srcRow = 0
    rows.foreach { y =>
      var x = 0
      while (x < fw) {
        val idx = indices(srcRow * fw + x)
        val o = 3 * ((top + y) * sw + (left + x))
        out(o) = table(3 * idx + 2) & 0xff
        out(o + 1) = table(3 * idx + 1) & 0xff
        out(o + 2) = table(3 * idx) & 0xff
        x += 1
      }
      srcRow += 1
    }
    MediaCodec.Bmp24(sw, sh, out)
  }

  /** Guard for [[decode]] on untrusted corpus bytes: full decode under
    * the fault contract (GIF has no CRC, so structure alone cannot
    * prove the LZW stream complete — and payloads are palette-bounded
    * small, so the double decode is cheap).
    */
  def isDecodable(b: Array[Byte]): Boolean =
    try { decode(b); true }
    catch { case _: IllegalArgumentException => false }
}
