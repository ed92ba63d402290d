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

  test("metadata-only reads never deserialize payload column (pruning-friendly schema)") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val media = Multimodal.fakeMediaFrom(docs, "doc_id", "text")
    // payload is a separate top-level binary column -> parquet can prune it
    assert(media.schema("payload").dataType.typeName === "binary")
    assert(media.select("doc_id", "media_type").columns.length === 2)
  }
}
