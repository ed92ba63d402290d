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

  private def iv(rows: Seq[(Long, Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("k", "id", "s", "e")
      .withColumn("s", $"s".cast("timestamp"))
      .withColumn("e", $"e".cast("timestamp"))
  }

  test("intervalOverlapPairs: same-key overlaps with intersection bounds") {
    import spark.implicits._
    val df = iv(Seq(
      (1L, 1L, "2024-01-01 00:00:00", "2024-01-10 00:00:00"),
      (1L, 2L, "2024-01-05 00:00:00", "2024-01-15 00:00:00"),
      (1L, 3L, "2024-01-20 00:00:00", "2024-01-30 00:00:00"),
      (2L, 4L, "2024-01-05 00:00:00", "2024-01-15 00:00:00"))) // other key
    val out = RangeJoin.intervalOverlapPairs(df, "k", "id", "s", "e", 86400L)
      .select($"id_a", $"id_b", $"overlap_start".cast("string"),
        $"overlap_end".cast("string"))
      .as[(Long, Long, String, String)].collect().toList
    assert(out === List(
      (1L, 2L, "2024-01-05 00:00:00", "2024-01-10 00:00:00")))
  }

  test("intervalOverlapPairs emits one row per pair across many shared bins") {
    val df = iv(Seq(
      (1L, 1L, "2024-01-01 00:00:00", "2024-03-01 00:00:00"),
      (1L, 2L, "2024-01-02 00:00:00", "2024-02-28 00:00:00")))
    // 57 shared day-bins; first-live-bin reporting must emit exactly one
    assert(RangeJoin.intervalOverlapPairs(df, "k", "id", "s", "e", 86400L)
      .count() === 1L)
  }

  test("intervalOverlapPairs: touching half-open intervals do not overlap") {
    val df = iv(Seq(
      (1L, 1L, "2024-01-01 00:00:00", "2024-01-05 00:00:00"),
      (1L, 2L, "2024-01-05 00:00:00", "2024-01-09 00:00:00")))
    assert(RangeJoin.intervalOverlapPairs(df, "k", "id", "s", "e", 86400L)
      .count() === 0L)
  }

  test("intervalOverlapPairs drops inverted intervals instead of fanning out") {
    val df = iv(Seq(
      (1L, 1L, "2030-01-01 00:00:00", "2024-01-01 00:00:00"), // inverted
      (1L, 2L, "2024-01-01 00:00:00", "2024-01-05 00:00:00")))
    assert(RangeJoin.intervalOverlapPairs(df, "k", "id", "s", "e", 86400L)
      .count() === 0L)
  }

  test("intervalOverlapPairs plans as an equi-join") {
    val df = iv(Seq((1L, 1L, "2024-01-01 00:00:00", "2024-01-02 00:00:00")))
    val plan = RangeJoin.intervalOverlapPairs(df, "k", "id", "s", "e", 86400L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
