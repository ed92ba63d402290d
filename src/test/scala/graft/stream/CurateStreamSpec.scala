package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.{TextClean, TextStats}

/** The curation operators are plain Column expressions + stateful
  * dedup, so the batch pipeline (scrub → quality gate → exact dedup)
  * composes unchanged on a STREAM — this spec is the proof.
  */
class CurateStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming curation: scrub -> quality gate -> dedup, incremental") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")

    val curated = StreamDedup.exact(
      docs
        .withColumn("clean_text", TextClean.scrub(col("text")))
        .withColumn("n_tokens", TextStats.tokenCount(col("clean_text")))
        .filter(col("n_tokens") >= 4),
      "clean_text")

    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("curated_out").start()
    try {
      mem.addData(
        (1L, "the quick   brown fox jumps over it"), // messy spacing
        (2L, "too short"),                           // fails the gate
        (3L, "the quick brown fox jumps over it"))   // dup of 1 after scrub
      q.processAllAvailable()
      mem.addData(
        (4L, "the quick brown fox jumps over it"),   // dup in later batch
        (5L, "a genuinely different long document here"))
      q.processAllAvailable()

      val out = spark.table("curated_out")
        .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
      assert(out.keySet === Set(1L, 5L))
      assert(out(1L) === "the quick brown fox jumps over it")
    } finally q.stop()
  }

  test("streaming chunk + sample + split: stateless curation ops on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")

    // The round-3 curation ops are pure projections/filters, so they
    // compose on an unbounded stream with NO state and no watermark:
    // deterministic sample gate -> split assignment -> token chunking.
    val prepped = graft.ext.TextStats.tokenWindowChunks(
      graft.ext.Sampling.splitAssign(
        graft.ext.Sampling.hashSample(docs, "doc_id", 100), "doc_id"),
      "doc_id", "text", chunkSize = 4, overlap = 1)

    val q = prepped.writeStream.outputMode("append")
      .format("memory").queryName("chunked_out").start()
    try {
      mem.addData(
        (1L, "t0 t1 t2 t3 t4 t5"), // 6 toks, size 4 stride 3 -> 2 chunks
        (2L, "a b"))
      q.processAllAvailable()
      val rows = spark.table("chunked_out")
        .select("doc_id", "chunk_id", "chunk_text")
        .as[(Long, Long, String)].collect().toSet
      assert(rows === Set(
        (1L, 0L, "t0 t1 t2 t3"), (1L, 1L, "t3 t4 t5"),
        (2L, 0L, "a b")))
      // split column must match the batch assignment for the same keys
      val streamSplits = spark.table("chunked_out")
        .select("doc_id", "split").distinct().as[(Long, String)].collect().toMap
      val batchSplits = graft.ext.Sampling.splitAssign(
        Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text"), "doc_id")
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      assert(streamSplits === batchSplits)
    } finally q.stop()
  }
}
