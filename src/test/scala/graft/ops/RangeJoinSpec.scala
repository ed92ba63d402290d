package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("binnedIntervalJoin honors half-open [start, end) boundaries") {
    val points = Seq(
      ts("2024-01-01 00:00:00"), // == start: in
      ts("2024-01-01 23:59:59"), // inside
      ts("2024-01-02 00:00:00"), // == end: OUT (half-open)
      ts("2023-12-31 23:59:59")  // before: out
    ).toDF("ts")
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
    ).toDF("k", "lo", "hi")
    val got = RangeJoin.binnedIntervalJoin(points, "ts", intervals, "lo", "hi", 86400L)
      .select("ts").as[Timestamp].collect().toSet
    assert(got == Set(ts("2024-01-01 00:00:00"), ts("2024-01-01 23:59:59")))
  }

  test("inverted and empty intervals are dropped, not exploded downward") {
    // sequence(start, stop) with stop < start counts DOWN by default —
    // one badly-inverted interval must not fan out into spurious bins.
    val points = Seq(ts("2024-01-01 12:00:00")).toDF("ts")
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")), // valid
      (2L, ts("2024-06-01 00:00:00"), ts("2020-01-01 00:00:00")), // inverted (years)
      (3L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"))  // empty
    ).toDF("k", "lo", "hi")
    val out = RangeJoin.binnedIntervalJoin(points, "ts", intervals, "lo", "hi", 86400L)
    assert(out.select("k").as[Long].collect().toSeq == Seq(1L))
    // and the exploded bin volume stays O(interval days), not O(years)
    val counted = RangeJoin.intervalPointCount(
      points, "ts", intervals, "k", "lo", "hi", 86400L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(counted == Map(1L -> 1L, 2L -> 0L, 3L -> 0L))
  }

  test("intervals spanning bin boundaries still match every covered point") {
    // interval 18:00 → 06:00 next day crosses a day-bin edge
    val points = Seq(
      ts("2024-01-01 19:00:00"),
      ts("2024-01-02 05:00:00"),
      ts("2024-01-02 07:00:00")
    ).toDF("ts")
    val intervals = Seq(
      (1L, ts("2024-01-01 18:00:00"), ts("2024-01-02 06:00:00"))
    ).toDF("k", "lo", "hi")
    val got = RangeJoin.binnedIntervalJoin(points, "ts", intervals, "lo", "hi", 86400L)
      .count()
    assert(got == 2L)
  }

  test("intervalPointCount equals the brute-force range join, including zero counts") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("o_end", col("o_orderdate") + expr("INTERVAL 1 DAY"))
    val got = RangeJoin.intervalPointCount(
      li, "l_shipdate", orders, "o_orderkey", "o_orderdate", "o_end", 86400L)
    li.createOrReplaceTempView("li_rj")
    orders.createOrReplaceTempView("ord_rj")
    val want = spark.sql(
      """SELECT o.o_orderkey, COUNT(l.l_orderkey) AS cnt
        |FROM ord_rj o LEFT JOIN li_rj l
        |  ON l.l_shipdate >= o.o_orderdate AND l.l_shipdate < o.o_end
        |GROUP BY 1""".stripMargin)
    assert(got.count() == orders.count(), "left semantics: every interval reported")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("the binned join plans as a hash join, never a nested loop") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("o_end", col("o_orderdate") + expr("INTERVAL 1 DAY"))
    val plan = RangeJoin.binnedIntervalJoin(
      li, "l_shipdate", orders.select("o_orderkey", "o_orderdate", "o_end"),
      "o_orderdate", "o_end", 86400L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a nested loop:\n$plan")
  }
}
