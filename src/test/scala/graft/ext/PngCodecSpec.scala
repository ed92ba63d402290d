package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** PNG codec: EXACT roundtrips (the format is lossless — unlike the
  * JPEG spec there is NO tolerance anywhere), both-direction
  * cross-checks against the JDK's independent ImageIO PNG
  * implementation, the full filter/interlace/color-type matrix, and
  * the untrusted-bytes fault contract.
  */
class PngCodecSpec extends AnyFunSuite {

  private def imageIoDecode(b: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))

  private def assertExactVsImageIo(
      mine: MediaCodec.Bmp24, ref: java.awt.image.BufferedImage): Unit = {
    assert(mine.width === ref.getWidth && mine.height === ref.getHeight)
    for (y <- 0 until mine.height; x <- 0 until mine.width) {
      val rgb = ref.getRGB(x, y)
      assert(mine(x, y, 2) === ((rgb >> 16) & 0xff), s"R at ($x,$y)")
      assert(mine(x, y, 1) === ((rgb >> 8) & 0xff), s"G at ($x,$y)")
      assert(mine(x, y, 0) === (rgb & 0xff), s"B at ($x,$y)")
    }
  }

  test("RGB roundtrips BIT-EXACTLY across dims, every fixed filter " +
    "type, the cycling-filter mode, and Adam7 interlace") {
    for {
      (w, h) <- Seq((1, 1), (8, 8), (9, 6), (23, 17), (3, 7), (16, 1), (1, 9))
      filter <- Seq(-1, 0, 1, 2, 3, 4)
      interlaced <- Seq(false, true)
    } {
      def v(x: Int, y: Int, c: Int): Int = (x * 13 + y * 31 + c * 77) % 256
      val png = PngCodec.encode(w, h, 3, v, filter, interlaced)
      assert(MediaCodec.detect(png) === "png")
      assert(PngCodec.isDecodable(png))
      val img = PngCodec.decode(png)
      assert(img.width === w && img.height === h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        // encode samples are RGB-ordered; Bmp24 c=0 is B → sample 2-c
        assert(img(x, y, c) === v(x, y, 2 - c),
          s"(${w}x$h f=$filter il=$interlaced) pixel ($x,$y,$c)")
    }
  }

  test("grayscale, gray+alpha and RGBA roundtrip exactly (alpha " +
    "dropped, gray expands to B=G=R)") {
    for {
      ch <- Seq(1, 2, 4)
      interlaced <- Seq(false, true)
    } {
      def v(x: Int, y: Int, c: Int): Int = (x * 7 + y * 11 + c * 3) % 256
      val png = PngCodec.encode(10, 6, ch, v, -1, interlaced)
      val img = PngCodec.decode(png)
      for (y <- 0 until 6; x <- 0 until 10)
        ch match {
          case 1 | 2 => // gray(+alpha): B = G = R = sample 0
            for (c <- 0 until 3)
              assert(img(x, y, c) === v(x, y, 0), s"ch=$ch ($x,$y,$c)")
          case _ => // RGBA: color carried, alpha gone
            for (c <- 0 until 3)
              assert(img(x, y, c) === v(x, y, 2 - c), s"ch=$ch ($x,$y,$c)")
        }
    }
  }

  test("indexed-color (PLTE) roundtrips exactly at bit depths " +
    "1/2/4/8, interlaced and not") {
    for {
      depth <- Seq(1, 2, 4, 8)
      interlaced <- Seq(false, true)
    } {
      val n = 1 << depth
      val palette = Array.tabulate(n)(i =>
        ((i * 37 % 256) << 16) | ((i * 59 % 256) << 8) | (i * 83 % 256))
      def idx(x: Int, y: Int): Int = (x * 3 + y * 5) % n
      val png = PngCodec.encodeIndexed(11, 7, palette, idx, depth, interlaced)
      assert(PngCodec.isDecodable(png))
      val img = PngCodec.decode(png)
      for (y <- 0 until 7; x <- 0 until 11) {
        val e = palette(idx(x, y))
        assert(img(x, y, 2) === ((e >> 16) & 0xff), s"d=$depth R ($x,$y)")
        assert(img(x, y, 1) === ((e >> 8) & 0xff), s"d=$depth G ($x,$y)")
        assert(img(x, y, 0) === (e & 0xff), s"d=$depth B ($x,$y)")
      }
    }
  }

  test("ImageIO-encoded PNGs (RGB, gray, 1-bit, with ancillary " +
    "chunks) decode EXACTLY — cross-implementation, zero tolerance") {
    import java.awt.image.BufferedImage
    // RGB
    val rgb = new BufferedImage(19, 13, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 13; x <- 0 until 19)
      rgb.setRGB(x, y,
        ((x * 11 + y) % 256 << 16) | ((y * 17 + x) % 256 << 8) |
          ((x * 3 + y * 29) % 256))
    // grayscale
    val gray = new BufferedImage(9, 14, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 14; x <- 0 until 9)
      gray.getRaster.setSample(x, y, 0, (x * 19 + y * 7) % 256)
    // 1-bit binary
    val bin = new BufferedImage(17, 5, BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until 5; x <- 0 until 17)
      bin.getRaster.setSample(x, y, 0, (x + y) % 2)
    for ((img, name) <- Seq((rgb, "rgb"), (gray, "gray"), (bin, "bin"))) {
      val bos = new java.io.ByteArrayOutputStream
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      val bytes = bos.toByteArray
      assert(MediaCodec.detect(bytes) === "png", name)
      assert(PngCodec.isDecodable(bytes), name)
      val mine = PngCodec.decode(bytes)
      if (name == "gray")
        // getRGB gamma-converts linear gray; compare raster samples
        for (y <- 0 until 14; x <- 0 until 9; c <- 0 until 3)
          assert(mine(x, y, c) === gray.getRaster.getSample(x, y, 0),
            s"gray ($x,$y,$c)")
      else assertExactVsImageIo(mine, img)
    }
  }

  test("our encodes (every channel count, cycling filters, Adam7) " +
    "decode EXACTLY in ImageIO — the other direction") {
    for {
      ch <- Seq(1, 3, 4)
      interlaced <- Seq(false, true)
    } {
      def v(x: Int, y: Int, c: Int): Int =
        if (ch == 4 && c == 3) 255 // opaque: getRGB premultiplies else
        else (x * 13 + y * 31 + c * 77) % 256
      val png = PngCodec.encode(12, 9, ch, v, -1, interlaced)
      val ref = imageIoDecode(png)
      assert(ref != null, s"ImageIO rejected our PNG (ch=$ch il=$interlaced)")
      assert(ref.getWidth === 12 && ref.getHeight === 9)
      for (y <- 0 until 9; x <- 0 until 12) {
        if (ch == 1) {
          // raster sample, NOT getRGB: getRGB gamma-converts linear
          // gray to sRGB (same comparison artifact as the JPEG spec)
          assert(ref.getRaster.getSample(x, y, 0) === v(x, y, 0),
            s"ch=1 il=$interlaced gray ($x,$y)")
        } else {
          val rgb = ref.getRGB(x, y)
          assert(((rgb >> 16) & 0xff) === v(x, y, 0),
            s"ch=$ch il=$interlaced R ($x,$y)")
          assert(((rgb >> 8) & 0xff) === v(x, y, 1),
            s"ch=$ch il=$interlaced G ($x,$y)")
          assert((rgb & 0xff) === v(x, y, 2),
            s"ch=$ch il=$interlaced B ($x,$y)")
        }
      }
    }
  }

  test("byte-fuzzed streams NEVER escape as AIOOBE/OOM — every fault " +
    "is an IllegalArgumentException (untrusted corpus bytes contract)") {
    val rnd = new scala.util.Random(0x9e77L)
    val base = PngCodec.encode(24, 16, 3,
      (x, y, c) => (x * 7 + y * 5 + c * 3) % 256, -1, interlaced = true)
    for (trial <- 1 to 300) {
      val mutated = base.clone()
      val flips = 1 + rnd.nextInt(4)
      for (_ <- 0 until flips)
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      try { PngCodec.decode(mutated); () }
      catch {
        case _: IllegalArgumentException => () // the contract
        case e: Throwable =>
          fail(s"trial $trial escaped with ${e.getClass.getName}: " +
            s"${e.getMessage}")
      }
      val cut = base.take(1 + rnd.nextInt(base.length - 1))
      try { PngCodec.decode(cut); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable =>
          fail(s"truncation trial $trial escaped with ${e.getClass.getName}")
      }
    }
    // Directed extreme u32 values in every aligned slot: random pokes
    // almost never craft a near-Int.MaxValue chunk length (the class
    // that wrapped the WAV walk cursor) — write them explicitly.
    for (off <- 0 until (base.length - 3) by 4;
         v <- Seq(0x7fffffff, 0x7ffffff0, 0x80000000, -1, 2, 3, 8)) {
      val m = base.clone()
      m(off) = ((v >> 24) & 0xff).toByte
      m(off + 1) = ((v >> 16) & 0xff).toByte
      m(off + 2) = ((v >> 8) & 0xff).toByte
      m(off + 3) = (v & 0xff).toByte
      try { PngCodec.decode(m); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable =>
          fail(s"extreme-u32 at $off escaped with ${e.getClass.getName}")
      }
    }
  }

  test("hostile dimensions refuse at the decode cap BEFORE inflate; " +
    "16-bit depth and unknown critical chunks reject with clear faults") {
    // Patch IHDR dims to 65535x65535 and re-CRC the chunk — a valid
    // stream whose only fault is the allocation it demands.
    val huge = PngCodec.encode(8, 8, 3, (_, _, _) => 0)
    // width/height are u32be at 16/20 — low half 0xffff = 65535
    for (d <- Seq(18, 19, 22, 23)) huge(d) = 0xff.toByte
    val crc = new java.util.zip.CRC32
    crc.update(huge, 12, 17)
    val cv = crc.getValue.toInt
    huge(29) = (cv >>> 24).toByte; huge(30) = (cv >>> 16).toByte
    huge(31) = (cv >>> 8).toByte; huge(32) = cv.toByte
    val e = intercept[IllegalArgumentException](PngCodec.decode(huge))
    assert(e.getMessage.contains("decode cap"), e.getMessage)
    // the STRUCTURAL guard accepts it (dims are a decode-time cap, not
    // a structure fault) — consumers rely on decodeChecked's fallback
    assert(PngCodec.isDecodable(huge))
    // 16-bit depth
    val deep = PngCodec.encode(4, 4, 3, (_, _, _) => 0)
    deep(24) = 16
    val crc2 = new java.util.zip.CRC32
    crc2.update(deep, 12, 17)
    val cv2 = crc2.getValue.toInt
    deep(29) = (cv2 >>> 24).toByte; deep(30) = (cv2 >>> 16).toByte
    deep(31) = (cv2 >>> 8).toByte; deep(32) = cv2.toByte
    val e2 = intercept[IllegalArgumentException](PngCodec.decode(deep))
    assert(e2.getMessage.contains("16-bit"), e2.getMessage)
    assert(!PngCodec.isDecodable(deep))
  }

  test("header-only synthesizePng payloads and truncated zlib gate " +
    "correctly: guard false / decode IAE, never a crash") {
    val headerOnly = MediaCodec.synthesizePng(32, 20)
    assert(MediaCodec.detect(headerOnly) === "png")
    assert(!PngCodec.isDecodable(headerOnly)) // no IDAT
    intercept[IllegalArgumentException](PngCodec.decode(headerOnly))
    // structurally valid chunks, truncated zlib payload: guard passes
    // (structural, like JPEG's), decode faults as IAE — the window
    // Multimodal.decodeChecked covers
    val full = PngCodec.encode(16, 16, 3, (x, y, c) => (x + y + c) % 256)
    val idatLen = {
      var pos = 8
      var len = -1
      while (len < 0) {
        val l = ((full(pos) & 0xff) << 24) | ((full(pos + 1) & 0xff) << 16) |
          ((full(pos + 2) & 0xff) << 8) | (full(pos + 3) & 0xff)
        val typ = new String(full, pos + 4, 4, "ISO-8859-1")
        if (typ == "IDAT") len = l else pos += 12 + l
      }
      len
    }
    assert(idatLen > 8)
    val cutZlib = {
      // rebuild with the IDAT data cut in half (CRC recomputed)
      val out = new java.io.ByteArrayOutputStream
      var pos = 0
      out.write(full, 0, 8); pos = 8
      while (pos < full.length) {
        val l = ((full(pos) & 0xff) << 24) | ((full(pos + 1) & 0xff) << 16) |
          ((full(pos + 2) & 0xff) << 8) | (full(pos + 3) & 0xff)
        val typ = new String(full, pos + 4, 4, "ISO-8859-1")
        if (typ == "IDAT") {
          val keep = l / 2
          val head = new Array[Byte](8)
          head(0) = (keep >>> 24).toByte; head(1) = (keep >>> 16).toByte
          head(2) = (keep >>> 8).toByte; head(3) = keep.toByte
          System.arraycopy(full, pos + 4, head, 4, 4)
          out.write(head)
          out.write(full, pos + 8, keep)
          val crc = new java.util.zip.CRC32
          crc.update(head, 4, 4)
          crc.update(full, pos + 8, keep)
          val t = new Array[Byte](4)
          val cv = crc.getValue.toInt
          t(0) = (cv >>> 24).toByte; t(1) = (cv >>> 16).toByte
          t(2) = (cv >>> 8).toByte; t(3) = cv.toByte
          out.write(t)
        } else out.write(full, pos, 12 + l)
        pos += 12 + l
      }
      out.toByteArray
    }
    assert(PngCodec.isDecodable(cutZlib)) // structural guard passes
    val e = intercept[IllegalArgumentException](PngCodec.decode(cutZlib))
    assert(e.getMessage.toLowerCase.contains("truncated") ||
      e.getMessage.toLowerCase.contains("short"), e.getMessage)
  }

  test("decodeImage/isDecodableImage dispatch PNG through the unified " +
    "shape beside BMP and JPEG") {
    val png = PngCodec.encode(6, 4, 3, (x, y, c) => (x + y * 2 + c) % 256)
    assert(MediaCodec.isDecodableImage(png))
    val img = MediaCodec.decodeImage(png)
    assert(img.width === 6 && img.height === 4)
    assert(img(3, 2, 2) === (3 + 2 * 2 + 0) % 256) // R = sample 0
  }
}
