package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming exact dedup emits first occurrence only, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")

    val q = StreamDedup.exact(docs, "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      // duplicate arriving in a LATER batch is also suppressed
      mem.addData((4L, "alpha"), (5L, "gamma"))
      q.processAllAvailable()
      val out = spark.table("dedup_out")
        .as[(Long, String)].collect().toMap
      assert(out.values.toSet === Set("alpha", "beta", "gamma"))
      assert(out.size === 3)
      // first copy of "alpha" won (doc 1, not 3 or 4)
      assert(out(1L) === "alpha" && !out.contains(3L) && !out.contains(4L))
    } finally q.stop()
  }

  test("watermarked dedup suppresses within horizon and bounds state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val docs = mem.toDF().toDF("ts", "text")

    val q = StreamDedup.exactWithinWatermark(docs, "text", "ts", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_wm_out").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:00"), "alpha"),
        (ts("2024-01-01 10:05:00"), "alpha"), // within horizon: suppressed
        (ts("2024-01-01 10:06:00"), "beta"))
      q.processAllAvailable()
      val first = spark.table("dedup_wm_out").as[(Timestamp, String)].collect()
      assert(first.map(_._2).sorted.toSeq === Seq("alpha", "beta"))
    } finally q.stop()
  }
}
