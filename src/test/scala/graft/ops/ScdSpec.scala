package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2FromChangelog collapses runs and closes versions half-open") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "bronze"),
      (1L, ts("2024-01-02 00:00:00"), 11L, "bronze"), // re-assert: same run
      (1L, ts("2024-01-03 00:00:00"), 12L, "silver"),
      (1L, ts("2024-01-04 00:00:00"), 13L, "bronze"), // back again: new run
      (2L, ts("2024-01-01 00:00:00"), 14L, "gold")
    ).toDF("user_id", "ts", "event_id", "tier")
    val out = Scd.scd2FromChangelog(
        log, Seq("user_id"), "ts", "event_id", Seq("tier"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
      .toSet
    assert(out == Set(
      (1L, "bronze", ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), false),
      (1L, "silver", ts("2024-01-03 00:00:00"), Some(ts("2024-01-04 00:00:00")), false),
      (1L, "bronze", ts("2024-01-04 00:00:00"), None, true),
      (2L, "gold", ts("2024-01-01 00:00:00"), None, true)))
  }

  test("scd2FromChangelog orders same-tick changes by the tiebreaker") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 20L, "a"),
      (1L, ts("2024-01-01 00:00:00"), 21L, "b") // same ts, later event_id
    ).toDF("user_id", "ts", "event_id", "tier")
    val out = Scd.scd2FromChangelog(
        log, Seq("user_id"), "ts", "event_id", Seq("tier"))
      .collect().map(r => (r.getString(1), r.getBoolean(4))).toSet
    // "a" opened first and was closed by "b" in the same tick
    assert(out == Set(("a", false), ("b", true)))
  }

  test("scd2FromChangelog treats null->value as a version boundary") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 30L, Option.empty[String]),
      (1L, ts("2024-01-02 00:00:00"), 31L, Some("x")),
      (1L, ts("2024-01-03 00:00:00"), 32L, Option.empty[String])
    ).toDF("user_id", "ts", "event_id", "tier")
    val n = Scd.scd2FromChangelog(
      log, Seq("user_id"), "ts", "event_id", Seq("tier")).count()
    assert(n == 3)
  }

  test("scd2FromChangelog drops un-placeable (null-ts) changes by contract") {
    val log = Seq(
      (1L, Some(ts("2024-01-01 00:00:00")), 1L, "a"),
      (1L, Option.empty[Timestamp], 2L, "b") // no place on the timeline
    ).toDF("user_id", "ts", "event_id", "tier")
    val out = Scd.scd2FromChangelog(
        log, Seq("user_id"), "ts", "event_id", Seq("tier"))
      .collect().map(r => (r.getString(1), r.getBoolean(4))).toSet
    assert(out == Set(("a", true)))
  }

  test("scd2FromChangelog plans exactly one Exchange for both window passes") {
    val log = Seq((1L, ts("2024-01-01 00:00:00"), 1L, "a"))
      .toDF("user_id", "ts", "event_id", "tier")
    val plan = Scd.scd2FromChangelog(
        log, Seq("user_id"), "ts", "event_id", Seq("tier"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"run-collapse filter must reuse the key partitioning:\n$plan")
  }

  test("scd2 history composes with the as-of join for point-in-time lookup") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "bronze"),
      (1L, ts("2024-01-03 00:00:00"), 11L, "silver")
    ).toDF("user_id", "ts", "event_id", "tier")
    val hist = Scd.scd2FromChangelog(
        log, Seq("user_id"), "ts", "event_id", Seq("tier"))
      .select($"user_id", $"tier", $"effective_from")
    val probes = Seq(
      (1L, ts("2023-12-31 00:00:00"), 100L), // before any version
      (1L, ts("2024-01-01 00:00:00"), 101L), // exactly at the open tick
      (1L, ts("2024-01-02 00:00:00"), 102L), // inside version 1
      (1L, ts("2024-01-04 00:00:00"), 103L)  // current version
    ).toDF("user_id", "ts", "probe_id")
    val out = AsOf.asOfJoin(probes, hist, Seq("user_id"), "ts", "effective_from")
      .collect().map(r => (r.getLong(2), Option(r.getString(3)))).toMap
    assert(out == Map(
      100L -> None, 101L -> Some("bronze"),
      102L -> Some("bronze"), 103L -> Some("silver")))
  }

  test("snapshotDiff classifies insert/update/delete and drops unchanged") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val neu = Seq((1L, "a", 10.0), (2L, "b", 25.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")
    val out = Scd.snapshotDiff(old, neu, Seq("k"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .toSet
    assert(out == Set(
      (2L, "b", 25.0, "update"),  // new values
      (3L, "c", 30.0, "delete"),  // old values
      (4L, "d", 40.0, "insert")))
  }

  test("snapshotDiff compares null-safely") {
    val old = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "name")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "name")
    val out = Scd.snapshotDiff(old, neu, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    // key 1 unchanged (null == null under <=>); key 2 value -> null
    assert(out == Set((2L, "update")))
  }

  test("snapshotDiff is one full-outer join, no extra shuffle") {
    val old = Seq((1L, "a")).toDF("k", "name")
    val neu = Seq((1L, "b")).toDF("k", "name")
    val plan = Scd.snapshotDiff(old, neu, Seq("k"))
      .queryExecution.executedPlan.toString
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|BroadcastNestedLoopJoin".r
      .findAllIn(plan).size == 1, s"unexpected join count:\n$plan")
  }
}
