package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode plumbing: schema, determinism, partition parallelism") {
    val docs = Seq((1L, "hello"), (2L, "world!")).toDF("doc_id", "text")
    val media = Multimodal.fakeMediaFrom(docs, "doc_id", "text").repartition(2)
    val out = Multimodal.decodeMetadata(spark, media)
    assert(out.columns.toSeq === Seq(
      "doc_id", "media_type", "size_bytes", "width", "height", "channels",
      "checksum"))
    val rows = out.collect().map(r => r.doc_id -> r).toMap
    assert(rows(1L).size_bytes === 5L)
    assert(rows(1L).width === 5 % 640 + 1)
    assert(rows(1L).checksum === "5d41402abc4b2a76b9719d911017c592") // md5("hello")
    // deterministic across runs
    val again = Multimodal.decodeMetadata(spark, media).collect()
      .map(r => r.doc_id -> r.checksum).toMap
    assert(again(2L) === rows(2L).checksum)
  }

  test("feature extraction: fixed-width deterministic vectors, partition parallel") {
    val docs = Seq((1L, "hello world"), (2L, "spark engine")).toDF("doc_id", "text")
    val media = Multimodal.fakeMediaFrom(docs, "doc_id", "text").repartition(2)
    val f1 = Multimodal.extractFeatures(spark, media, dim = 8).collect()
      .map(r => r.doc_id -> r.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(spark, media, dim = 8).collect()
      .map(r => r.doc_id -> r.feature.toSeq).toMap
    assert(f1.keySet === Set(1L, 2L))
    assert(f1.values.forall(_.length === 8))
    assert(f1 === f2) // deterministic
    assert(f1(1L) !== f1(2L))
  }

  test("resize bounds payload and stamps dimensions") {
    val docs = Seq((1L, "x" * 10000)).toDF("doc_id", "text")
    val media = Multimodal.fakeMediaFrom(docs, "doc_id", "text")
    val out = Multimodal.resize(spark, media, 64, 64).head()
    assert(out.width === 64 && out.height === 64)
    assert(out.payload.length === 64 * 64 / 64)
  }

  test("frame sampling emits n rows per media item") {
    val docs = Seq((1L, "abcdefghij"), (2L, "0123456789")).toDF("doc_id", "text")
    val media = Multimodal.fakeMediaFrom(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(spark, media, 4).collect()
    assert(frames.length === 8)
    assert(frames.map(_.frame_idx).toSet === Set(0, 1, 2, 3))
    // frames partition the payload bytes
    val total = frames.filter(_.doc_id == 1L).map(_.payload.length).sum
    assert(total === 10)
  }

  test("metadata-only reads never deserialize payload column (pruning-friendly schema)") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val media = Multimodal.fakeMediaFrom(docs, "doc_id", "text")
    // payload is a separate top-level binary column -> parquet can prune it
    assert(media.schema("payload").dataType.typeName === "binary")
    assert(media.select("doc_id", "media_type").columns.length === 2)
  }
}
