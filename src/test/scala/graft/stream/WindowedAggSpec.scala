package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class WindowedAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window aggregates by event time with watermark state cleanup") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")

    val q = WindowedAgg.tumbling(events, "1 hour", "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("tumbling_out").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:55:00"), "click", 2.0),
        (ts("2024-01-01 11:10:00"), "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close the 10:00 and 11:00 windows
      mem.addData((ts("2024-01-01 13:00:00"), "click", 0.0))
      q.processAllAvailable()
      val out = spark.table("tumbling_out")
        .select("window_start", "event_type", "n_events", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(out.contains((ts("2024-01-01 10:00:00"), "click", 2L, 3.0)))
      assert(out.contains((ts("2024-01-01 11:00:00"), "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("sessionWindows merges gap-connected events and splits across the gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val events = mem.toDF().toDF("ts", "user_id", "value")

    val q = WindowedAgg.sessionWindows(events, gap = "10 minutes",
      watermark = "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sesswin_out").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:00"), 1L, 1.0),
        (ts("2024-01-01 10:05:00"), 1L, 2.0),  // same session (gap 5m)
        (ts("2024-01-01 10:30:00"), 1L, 4.0),  // new session (gap 25m)
        (ts("2024-01-01 10:00:00"), 2L, 8.0))
      q.processAllAvailable()
      // advance the watermark past every open session's close
      mem.addData((ts("2024-01-01 12:00:00"), 9L, 0.0))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 12:30:00"), 9L, 0.0))
      q.processAllAvailable()
      val out = spark.table("sesswin_out")
        .select("user_id", "session_start", "n_events", "sum_value")
        .as[(Long, Timestamp, Long, Double)].collect().toSet
      assert(out.contains((1L, ts("2024-01-01 10:00:00"), 2L, 3.0)))
      assert(out.contains((1L, ts("2024-01-01 10:30:00"), 1L, 4.0)))
      assert(out.contains((2L, ts("2024-01-01 10:00:00"), 1L, 8.0)))
    } finally q.stop()
  }

  test("late event beyond the watermark is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = WindowedAgg.tumbling(events, "1 hour", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      mem.addData((ts("2024-01-01 10:05:00"), "click", 1.0))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 14:00:00"), "click", 1.0)) // watermark → 13:50
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 10:06:00"), "click", 100.0)) // too late
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 16:00:00"), "click", 1.0)) // close everything old
      q.processAllAvailable()
      val m = spark.table("late_out")
        .select("window_start", "n_events", "sum_value")
        .as[(Timestamp, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(m(ts("2024-01-01 10:00:00")) === ((1L, 1.0))) // late row excluded
    } finally q.stop()
  }

  test("sessionization closes a session after the gap and aggregates it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[WindowedAgg.Event]
    // AvailableNow: process pending data then stop — the default
    // as-fast-as-possible trigger busy-loops on ProcessingTimeTimeout
    // evaluation and never quiesces for processAllAvailable.
    mem.addData(
      WindowedAgg.Event(ts("2024-01-01 10:00:00"), 1L, 1.0),
      WindowedAgg.Event(ts("2024-01-01 10:05:00"), 1L, 2.0),
      // > 10 min gap → new session for user 1
      WindowedAgg.Event(ts("2024-01-01 11:00:00"), 1L, 7.0))
    val q = WindowedAgg.sessionize(spark, mem.toDS(), gapMs = 10 * 60 * 1000L)
      .writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("sessions_out").start()
    try {
      q.awaitTermination(120000)
      val out = spark.table("sessions_out").as[WindowedAgg.Session]
        .collect()
      // first session closed by the in-batch gap
      assert(out.exists(s => s.user_id == 1L && s.n_events == 2 &&
        s.sum_value == 3.0 &&
        s.session_start == ts("2024-01-01 10:00:00") &&
        s.session_end == ts("2024-01-01 10:05:00")))
    } finally q.stop()
  }
}
