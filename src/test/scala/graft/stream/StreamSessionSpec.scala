package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StreamSessionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (user_id, event_id, ts, value)
  private val day1 = Seq(
    (1L, 1L, ts("2024-01-01 10:00:00"), 1.25),
    (1L, 2L, ts("2024-01-01 10:10:00"), 2.5),
    (1L, 3L, ts("2024-01-01 11:30:00"), 0.5),  // > 30 min gap: session 2
    (2L, 4L, ts("2024-01-01 10:05:00"), 4.0),
    (2L, 5L, ts("2024-01-01 12:00:00"), 8.0),  // session 2 for user 2
    (3L, 6L, ts("2024-01-01 10:20:00"), 0.25))

  test("closed sessions match the batch gaps-and-islands sessionizer") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = StreamSession
      .sessionize(mem.toDF().toDF("user_id", "event_id", "ts", "value"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // feed in two event-time-ordered batches, split mid-session
      val (a, b) = day1.sortBy(e => e._3.getTime).splitAt(3)
      mem.addData(a: _*)
      q.processAllAvailable()
      mem.addData(b: _*)
      q.processAllAvailable()
      // sentinel far-future event advances the watermark past every
      // session's end+gap so idle sessions emit via timeout
      mem.addData((99L, 999L, ts("2024-01-02 00:00:00"), 0.0))
      q.processAllAvailable()

      val streamed = spark.table("sess_out")
        .filter($"user_id" =!= 99L)
        .select($"user_id", $"session_id", $"session_start",
          $"session_end", $"n_events", $"sum_value")
        .as[(Long, Long, Timestamp, Timestamp, Long, Double)]
        .collect().toSet

      val batch = graft.ext.Analytics
        .sessionizeBatch(day1.toDF("user_id", "event_id", "ts", "value"))
        .select($"user_id", $"session_id", $"session_start",
          $"session_end", $"n_events", $"sum_value")
        .as[(Long, Long, Timestamp, Timestamp, Long, Double)]
        .collect().toSet

      assert(streamed === batch)
      assert(streamed.size === 5) // u1: 2 sessions, u2: 2, u3: 1
    } finally q.stop()
  }

  test("sessions close in-batch on gap crossings and state is dropped after timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = StreamSession
      .sessionize(mem.toDF().toDF("user_id", "event_id", "ts", "value"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out2").start()
    try {
      // one batch containing a full session AND the next session's start:
      // the first must be emitted immediately, without any timeout
      mem.addData(
        (7L, 1L, ts("2024-01-01 09:00:00"), 1.0),
        (7L, 2L, ts("2024-01-01 09:05:00"), 1.0),
        (7L, 3L, ts("2024-01-01 10:00:00"), 2.0))
      q.processAllAvailable()
      val immediate = spark.table("sess_out2")
        .as[StreamSession.ClosedSession].collect()
      assert(immediate.map(s => (s.user_id, s.session_id, s.n_events)).toSeq
        === Seq((7L, 1L, 2L)))

      // a session that closed by gap gets id 1; the open one will be 2
      mem.addData((8L, 4L, ts("2024-01-01 15:00:00"), 0.5))
      q.processAllAvailable()
      // advance watermark far: both open sessions flush via timeout
      mem.addData((99L, 99L, ts("2024-01-03 00:00:00"), 0.0))
      q.processAllAvailable()
      val all = spark.table("sess_out2")
        .filter($"user_id" =!= 99L)
        .as[StreamSession.ClosedSession].collect()
        .map(s => (s.user_id, s.session_id) -> s).toMap
      assert(all((7L, 2L)).n_events === 1L)
      assert(all((8L, 1L)).sum_value === 0.5)
      assert(all.size === 3)
    } finally q.stop()
  }
}
