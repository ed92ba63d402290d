package graft.ext

import java.sql.Timestamp
import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFillHourlyCounts zero-fills every (key, hour) cell of the global spine") {
    val ev = Seq(
      ("a", ts("2024-01-01 00:10:00")),
      ("a", ts("2024-01-01 00:50:00")),
      ("a", ts("2024-01-01 03:00:00")), // hours 1,2 are gaps for a
      ("b", ts("2024-01-01 01:30:00"))  // b missing hours 0,2,3
    ).toDF("event_type", "ts")
    val out = TimeSeries.gapFillHourlyCounts(ev, "event_type", "ts")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2)))
      .toSet
    assert(out == Set(
      ("a", "2024-01-01 00:00:00.0", 2L),
      ("a", "2024-01-01 01:00:00.0", 0L),
      ("a", "2024-01-01 02:00:00.0", 0L),
      ("a", "2024-01-01 03:00:00.0", 1L),
      ("b", "2024-01-01 00:00:00.0", 0L),
      ("b", "2024-01-01 01:00:00.0", 1L),
      ("b", "2024-01-01 02:00:00.0", 0L),
      ("b", "2024-01-01 03:00:00.0", 0L)))
  }

  test("rollingHourlyAverage trailing frame is exact over the dense series") {
    val ev = Seq(
      ("a", ts("2024-01-01 00:00:00")),
      ("a", ts("2024-01-01 00:30:00")),
      ("a", ts("2024-01-01 02:00:00"))
    ).toDF("event_type", "ts")
    // dense cnts: h0=2, h1=0, h2=1; frame=2 -> avgs: 2.0, 1.0, 0.5
    val out = TimeSeries.rollingHourlyAverage(ev, "event_type", "ts", frameHours = 2)
      .orderBy("hr").select("avg_frame").as[Double].collect().toSeq
    assert(out == Seq(2.0, 1.0, 0.5))
  }

  test("the hour spine is broadcast — the dense join never shuffles the spine side") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val plan = TimeSeries.gapFillHourlyCounts(ev, "event_type", "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"spine join not broadcast:\n$plan")
  }
}
