package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("attributionJoin matches right events inside the window, drops the rest") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoin.attributionJoin(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts"),
      "ad_id", "imp_ts", "click_ts",
      watermark = "1 hour", within = "10 MINUTES")

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      imps.addData(
        (1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 10:00:00")),
        (3L, ts("2024-01-01 10:00:00")))
      clicks.addData(
        (1L, ts("2024-01-01 10:05:00")), // inside window -> match
        (2L, ts("2024-01-01 10:20:00")), // outside window -> no match
        (2L, ts("2024-01-01 09:59:00")), // before impression -> no match
        (9L, ts("2024-01-01 10:01:00"))) // unknown ad -> no match
      q.processAllAvailable()
      val out = spark.table("attr_out")
        .select("ad_id").as[Long].collect().toSeq
      assert(out == Seq(1L))
    } finally q.stop()
  }

  test("a click attributes to every impression in range (join, not dedup)") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoin.attributionJoin(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts"),
      "ad_id", "imp_ts", "click_ts",
      watermark = "1 hour", within = "10 MINUTES")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_multi").start()
    try {
      imps.addData(
        (7L, ts("2024-01-01 10:00:00")),
        (7L, ts("2024-01-01 10:04:00")))
      clicks.addData((7L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(spark.table("attr_multi").count() == 2L)
    } finally q.stop()
  }

  test("left-outer emits unmatched impressions with nulls after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoin.attributionJoinLeftOuter(
      imps.toDF().toDF("ad_id", "imp_ts"),
      clicks.toDF().toDF("ad_id", "click_ts"),
      "ad_id", "imp_ts", "click_ts",
      watermark = "10 minutes", within = "10 MINUTES")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_outer").start()
    try {
      imps.addData(
        (1L, ts("2024-01-01 10:00:00")),  // will match
        (2L, ts("2024-01-01 10:30:00")))  // never clicked
      clicks.addData((1L, ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
      // push both watermarks far past 2's join window (closes 10:40):
      // watermark = 13:00 - 10 min = 12:50 >> 10:40, so 2 must resolve
      imps.addData((99L, ts("2024-01-01 13:00:00")))
      clicks.addData((98L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      imps.addData((97L, ts("2024-01-01 13:00:01")))
      clicks.addData((96L, ts("2024-01-01 13:00:01")))
      q.processAllAvailable()
      val rows = spark.table("attr_outer")
        .select("ad_id", "click_ts").collect()
      val matched = rows.filter(!_.isNullAt(1)).map(_.getLong(0)).toSet
      val unmatchedEmitted = rows.filter(_.isNullAt(1)).map(_.getLong(0)).toSet
      assert(matched == Set(1L))
      assert(unmatchedEmitted.contains(2L), s"unclicked impression not resolved: $unmatchedEmitted")
      assert(!unmatchedEmitted.contains(1L))
    } finally q.stop()
  }
}
