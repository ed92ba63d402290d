package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Multimodal columns: image/audio/video travel as opaque `binary`
  * payloads with typed metadata beside them (schema
  * [[graft.schema.Schemas.multimodal]]). North-star extension; no
  * reference equivalent.
  *
  * The Spark-side plumbing — schema, batch shape, partition-parallel
  * decode — is real. Header-level decode is ALSO real for BMP and
  * canonical PCM WAV ([[MediaCodec]], byte-level parsing via
  * [[parseMediaHeaders]]); pixel/sample decode beyond the header is
  * STUBBED (no image/audio libraries in this environment) behind
  * [[FakeCodec]], a deterministic stand-in with the same signature a
  * real decoder (javacv / a `mapInPandas` PIL worker on the PySpark
  * side) would have.
  *
  * Design for 100 TB: payloads are decoded per-partition via
  * `mapPartitions` over a typed Dataset, so one task holds one batch of
  * payloads at a time (constant memory per task, no driver collect);
  * metadata-only queries never touch the payload column thanks to
  * parquet column pruning.
  */
object Multimodal {

  final case class MediaRow(
      doc_id: Long, media_type: String, payload: Array[Byte])

  final case class DecodedMedia(
      doc_id: Long, media_type: String, size_bytes: Long,
      width: Int, height: Int, channels: Int, checksum: String)

  /** STUB decoder — deterministic fake. A real implementation replaces
    * exactly this object (signature-compatible) with e.g. an image
    * library; everything around it (schema, mapPartitions batch shape,
    * partitioning) is production plumbing.
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      // ??? <- real codec goes here; deterministic fake dimensions:
      val n = if (payload == null) 0 else payload.length
      (n % 640 + 1, (n * 31) % 480 + 1, 3)
    }
  }

  /** Wrap a text table as fake media rows (payload = utf-8 bytes) so the
    * decode pipeline is exercisable on the driver testdata.
    */
  def fakeMediaFrom(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("text").as("media_type"),
      col(textCol).cast("binary").as("payload"))

  final case class MediaFeatures(doc_id: Long, feature: Array[Float])
  final case class ResizedMedia(
      doc_id: Long, media_type: String, payload: Array[Byte],
      width: Int, height: Int)
  final case class Frame(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Feature extraction stub: a deterministic fixed-width float vector
    * per payload (a real implementation runs an image/audio encoder
    * here). Same mapPartitions batch shape as production: one encoder
    * instance per partition, vectors sized for a downstream
    * [[Similarity]] index.
    */
  def extractFeatures(
      spark: SparkSession, media: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions { rows =>
        // per-partition "model load" happens here in a real codec
        rows.map { r =>
          val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
          val f = Array.tabulate(dim) { i =>
            // ??? <- real encoder; deterministic fake projection:
            var acc = 0
            var j = i
            while (j < bytes.length) { acc = acc * 31 + bytes(j); j += dim }
            (acc % 1000) / 1000.0f
          }
          MediaFeatures(r.doc_id, f)
        }
      }
  }

  /** Resize stub: recomputes payload + dimensions deterministically
    * (truncation stands in for the pixel work; schema/flow is real).
    */
  def resize(
      spark: SparkSession, media: DataFrame,
      width: Int, height: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions(_.map { r =>
        val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
        // ??? <- real scaler; fake: clamp payload to width*height/64 bytes
        val n = math.max(1, math.min(bytes.length, width * height / 64))
        ResizedMedia(r.doc_id, r.media_type, bytes.take(n), width, height)
      })
  }

  /** Frame sampling stub: the 1→N row shape of video decode. Emits
    * `n` deterministic "frames" per payload via flatMap — partition
    * parallel, no driver involvement, output size n× input rows.
    */
  def sampleFrames(
      spark: SparkSession, media: DataFrame, n: Int): Dataset[Frame] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .flatMap { r =>
        val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
        (0 until n).map { i =>
          // ??? <- real frame grab; fake: strided slice per frame index
          val slice = bytes.zipWithIndex.collect {
            case (b, j) if j % n == i => b
          }
          Frame(r.doc_id, i, slice)
        }
      }
  }

  final case class ParsedHeader(
      doc_id: Long, format: String,
      width: Option[Int], height: Option[Int], bits_per_pixel: Option[Int],
      channels: Option[Int], sample_rate: Option[Int],
      bits_per_sample: Option[Int])

  /** REAL header decode (not a stub): BMP, canonical PCM WAV, PNG
    * (IHDR), JPEG/JFIF (SOF marker walk), GIF (logical screen
    * descriptor), and WebP (VP8X / VP8L) payloads are parsed
    * byte-for-byte by [[MediaCodec]]; anything else reports format
    * "unknown" with null fields. Image bits_per_pixel is bit depth ×
    * channels for PNG (channels derived from the color type),
    * precision × components for JPEG, the palette index depth for GIF,
    * and null for WebP (neither header variant carries a depth —
    * honest null beats an invented constant). Same partition-parallel
    * mapPartitions shape as [[decodeMetadata]] — one pass, no
    * shuffle, payload column pruned for callers that only select the
    * parsed fields downstream.
    */
  def parseMediaHeaders(spark: SparkSession, media: DataFrame): Dataset[ParsedHeader] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions(_.map { r =>
        MediaCodec.detect(r.payload) match {
          case "bmp" =>
            val h = MediaCodec.parseBmp(r.payload)
            ParsedHeader(r.doc_id, "bmp",
              Some(h.width), Some(h.height), Some(h.bitsPerPixel),
              None, None, None)
          case "wav" =>
            val h = MediaCodec.parseWav(r.payload)
            ParsedHeader(r.doc_id, "wav", None, None, None,
              Some(h.channels), Some(h.sampleRate), Some(h.bitsPerSample))
          case "png" =>
            val h = MediaCodec.parsePng(r.payload)
            ParsedHeader(r.doc_id, "png",
              Some(h.width), Some(h.height), Some(h.bitDepth * h.channels),
              None, None, None)
          case "jpeg" =>
            val h = MediaCodec.parseJpeg(r.payload)
            ParsedHeader(r.doc_id, "jpeg",
              Some(h.width), Some(h.height),
              Some(h.precision * h.components), None, None, None)
          case "gif" =>
            val h = MediaCodec.parseGif(r.payload)
            ParsedHeader(r.doc_id, "gif",
              Some(h.width), Some(h.height),
              Some(h.indexBits), None, None, None)
          case "webp" =>
            val h = MediaCodec.parseWebp(r.payload)
            // depth isn't in either header variant — honest null
            ParsedHeader(r.doc_id, "webp",
              Some(h.width), Some(h.height), None, None, None, None)
          case _ =>
            ParsedHeader(r.doc_id, "unknown", None, None, None, None, None, None)
        }
      })
  }

  /** Partition-parallel decode: one `mapPartitions` pass, no shuffle.
    * Output is a typed Dataset with payloads dropped (decoded metadata
    * only) — the common shape for feature-extraction stages.
    */
  def decodeMetadata(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, c) = FakeCodec.decode(r.payload)
          val sz = if (r.payload == null) 0L else r.payload.length.toLong
          val sum = java.security.MessageDigest.getInstance("MD5")
            .digest(if (r.payload == null) Array.emptyByteArray else r.payload)
            .map("%02x".format(_)).mkString
          DecodedMedia(r.doc_id, r.media_type, sz, w, h, c, sum)
        }
      }
  }

  final case class AudioEnergy(
      doc_id: Long, n_samples: Long, peak: Long, sum_sq: Long)

  /** REAL audio feature extraction (not the stub codec): decode the
    * 16-bit PCM data chunk byte-for-byte ([[MediaCodec.decodePcm16]],
    * chunk-walking) and reduce each clip to exact integer moments —
    * sample count, peak |amplitude|, sum of squares — plus the RMS as
    * a floor-quantized correctly-rounded sqrt of the exact ratio.
    * Same partition-parallel mapPartitions shape as
    * [[parseMediaHeaders]]: one pass, no shuffle; the oracle
    * recomputes the moments from the sample-generator formula, so the
    * hash only matches if the byte decode is exact.
    */
  def audioEnergy(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, floor, lit, sqrt}
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val samples = MediaCodec.decodePcm16(p)
        var peak = 0L
        var ss = 0L
        var i = 0
        while (i < samples.length) {
          val v = samples(i).toLong
          val a = math.abs(v)
          if (a > peak) peak = a
          ss += v * v
          i += 1
        }
        AudioEnergy(id, samples.length.toLong, peak, ss)
      }).toDF()
      .withColumn("rms_q",
        floor(sqrt(col("sum_sq").cast("double") /
          col("n_samples").cast("double")) * lit(1e6)).cast("long"))
  }

  final case class ImageStats(
      doc_id: Long, width: Long, height: Long,
      b_sum: Long, g_sum: Long, r_sum: Long, px_min: Long, px_max: Long)

  /** REAL image path: decode 24-bit BMP pixels
    * ([[MediaCodec.decodeBmp24]] — bottom-up rows, padding, BGR),
    * nearest-neighbor resize to `outW`×`outH` (source coordinate =
    * (dst·src)/dst in integer division), and reduce to exact integer
    * channel statistics of the RESIZED image. With a formula oracle,
    * the hash match proves decode AND resize coordinate math exact —
    * the image analog of [[audioEnergy]]; the remaining stub surface
    * is only the non-BMP pixel formats.
    */
  def imageResizeStats(
      spark: SparkSession, media: DataFrame,
      outW: Int, outH: Int): Dataset[ImageStats] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val img = MediaCodec.decodeBmp24(p)
        var (bs, gs, rs) = (0L, 0L, 0L)
        var mn = 255L
        var mx = 0L
        var y = 0
        while (y < outH) {
          val sy = y * img.height / outH
          var x = 0
          while (x < outW) {
            val sx = x * img.width / outW
            var c = 0
            while (c < 3) {
              val v = img(sx, sy, c).toLong
              c match {
                case 0 => bs += v
                case 1 => gs += v
                case _ => rs += v
              }
              if (v < mn) mn = v
              if (v > mx) mx = v
              c += 1
            }
            x += 1
          }
          y += 1
        }
        ImageStats(id, img.width.toLong, img.height.toLong,
          bs, gs, rs, mn, mx)
      })
  }

  final case class FrameStats(
      doc_id: Long, frame_idx: Long, b_sum: Long, g_sum: Long, r_sum: Long)

  /** REAL video path: decode the GVID container, keep every
    * `stride`-th frame (the frame-sampling a vision pipeline does
    * before the expensive encoder), decode each kept frame's BMP24
    * pixels, and reduce to exact per-frame channel sums. flatMap
    * 1→N/stride shape, partition-parallel, no shuffle; with the
    * pixel-formula oracle the hash proves container walk + frame
    * decode + stride math all exact. Completes the image/audio/video
    * triad of real byte-level decode paths.
    */
  def videoFrameStats(
      spark: SparkSession, media: DataFrame, stride: Int): Dataset[FrameStats] = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val frames = MediaCodec.decodeVideoFrames(p)
        frames.indices.collect { case f if f % stride == 0 =>
          val img = MediaCodec.decodeBmp24(frames(f))
          var (bs, gs, rs) = (0L, 0L, 0L)
          var i = 0
          while (i < img.pixels.length) {
            (i % 3) match {
              case 0 => bs += img.pixels(i)
              case 1 => gs += img.pixels(i)
              case _ => rs += img.pixels(i)
            }
            i += 1
          }
          FrameStats(id, f.toLong, bs, gs, rs)
        }
      }
  }
}
