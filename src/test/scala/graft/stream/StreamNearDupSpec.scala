package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat " +
      "watches from the warm stone wall near the old oak tree"

  test("scalar simHash60 matches the batch portable signature table " +
    "bit-for-bit") {
    val texts = Seq(
      (1L, base),
      (2L, base.replace("fox", "wolf")),
      (3L, "completely different words entirely"),
      (4L, "  padded   with   runs   of spaces  "),
      (5L, "единственный unicode têxt"))
    val batch = graft.ext.Dedup.portableSimHashSignatures(
      texts.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    texts.foreach { case (id, t) =>
      assert(StreamNearDup.simHash60(t) === batch(id), s"doc $id")
    }
  }

  test("gate: exact and near duplicates rejected across batches, " +
    "rejection names the min-id canonical, verdicts match the model") {
    implicit val sqlCtx = spark.sqlContext
    // A one-word edit: expectation derived from the scalar model so
    // the fixture can never drift from the algorithm's contract.
    val variant = base.replace("lazy", "sleepy")
    val s1 = StreamNearDup.simHash60(base)
    val s3 = StreamNearDup.simHash60(variant)
    val prefixBits = 4
    val sameBucket = (s1 >>> (60 - prefixBits)) == (s3 >>> (60 - prefixBits))
    val near = java.lang.Long.bitCount(s1 ^ s3) <= 5
    val mem = MemoryStream[(Long, String)]
    val q = StreamNearDup.gate(
      mem.toDF().toDF("doc_id", "text"), prefixBits = prefixBits)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try {
      mem.addData((1L, base), (2L, base))
      q.processAllAvailable()
      mem.addData((3L, variant), (4L, base)) // 4 = cross-batch exact dup
      q.processAllAvailable()
      val out = spark.table("neardup_out")
        .as[(Long, Long, Long, Boolean, Long)]
        .collect().map(r => r._1 -> ((r._4, r._5))).toMap
      assert(out(1L) === ((true, -1L)))
      assert(out(2L) === ((false, 1L)), "in-batch exact dup, min-id wins")
      assert(out(4L) === ((false, 1L)), "cross-batch exact dup")
      if (sameBucket && near) assert(out(3L) === ((false, 1L)))
      else assert(out(3L)._1 === true)
    } finally q.stop()
  }

  test("gate: maxPerBucket evicts oldest — recall degrades, memory " +
    "does not") {
    implicit val sqlCtx = spark.sqlContext
    // Self-fixturing search: find a text in doc 1's bucket but NOT
    // within Hamming 5 (prefixBits=1 halves the space, so most words
    // land bucket-compatible quickly).
    val prefixBits = 1
    val s1 = StreamNearDup.simHash60(base)
    val other = (0 until 500).iterator
      .map(i => s"unrelated corpus item number $i with many extra " +
        s"words token$i filler$i payload$i")
      .find { t =>
        val s = StreamNearDup.simHash60(t)
        (s >>> (60 - prefixBits)) == (s1 >>> (60 - prefixBits)) &&
          java.lang.Long.bitCount(s ^ s1) > 5
      }.get
    val mem = MemoryStream[(Long, String)]
    val q = StreamNearDup.gate(
      mem.toDF().toDF("doc_id", "text"),
      prefixBits = prefixBits, maxPerBucket = 1)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_evict").start()
    try {
      mem.addData((1L, base))
      q.processAllAvailable()
      mem.addData((2L, other)) // same bucket, distinct -> evicts doc 1
      q.processAllAvailable()
      mem.addData((3L, base)) // doc 1's state evicted -> re-admitted
      q.processAllAvailable()
      val out = spark.table("neardup_evict")
        .as[(Long, Long, Long, Boolean, Long)]
        .collect().map(r => r._1 -> r._4).toMap
      assert(out === Map(1L -> true, 2L -> true, 3L -> true))
    } finally q.stop()
  }
}
