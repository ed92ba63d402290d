package graft.ops

import graft.SparkSpec

class JoinPlannerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val smallBuild = (0L until 50L).map(i => (i, s"dim$i"))
    .toDF("k", "name")
  private lazy val evenProbe = (0L until 2000L).map(i => (i % 100, i))
    .toDF("k", "payload")
  // one hot key holding half the rows
  private lazy val skewProbe = ((0L until 1000L).map(_ => (7L, 1L)) ++
    (0L until 1000L).map(i => (i % 100 + 1000L, 2L)))
    .zipWithIndex.map { case ((k, g), i) => (k, g, i.toLong) }
    .toDF("k", "grp", "row_id")

  test("plan: each branch fires on the data shaped for it") {
    val big = (0L until 2000L).map(i => (i, i)).toDF("k", "x")
    assert(JoinPlanner.plan(evenProbe, smallBuild, Seq("k"),
      broadcastMaxRows = 100L).strategy === "broadcast")
    assert(JoinPlanner.plan(evenProbe, big, Seq("k"),
      broadcastMaxRows = 100L, skewRatio = 16L).strategy === "shuffle")
    val p = JoinPlanner.plan(skewProbe, big, Seq("k"),
      broadcastMaxRows = 100L, skewRatio = 16L)
    // max=1000 over 101 keys on 2000 rows: 1000*101 >= 16*2000
    assert(p.strategy === "salted")
    assert(p.probeMaxKeyRows === 1000L && p.probeRows === 2000L)
  }

  test("adaptiveJoin broadcast branch really broadcasts (plan contract)") {
    val (joined, plan) = JoinPlanner.adaptiveJoin(
      evenProbe, smallBuild, Seq("k"), broadcastMaxRows = 100L)
    assert(plan.strategy === "broadcast")
    joined.collect() // materialize so AQE finalizes the plan
    // AQE wraps the exchange in a BroadcastQueryStage whose subtree
    // plain collect() doesn't descend into — assert on the rendered
    // final plan instead.
    val rendered = joined.queryExecution.executedPlan.toString
    assert(rendered.contains("BroadcastHashJoin"),
      s"expected a BroadcastHashJoin in:\n$rendered")
    // result parity with a plain join
    assert(joined.count() ===
      evenProbe.join(smallBuild, Seq("k")).count())
  }

  test("adaptiveJoin salted branch: exact row parity with the plain " +
    "join, salt column gone") {
    val build = (0L until 1100L).map(i => (i, s"v$i")).toDF("k", "v")
    val (joined, plan) = JoinPlanner.adaptiveJoin(
      skewProbe, build, Seq("k"),
      broadcastMaxRows = 10L, skewRatio = 16L, salts = 8)
    assert(plan.strategy === "salted")
    assert(!joined.columns.contains("__graft_salt"))
    val expect = skewProbe.join(build, Seq("k"))
      .select("k", "row_id", "v").as[(Long, Long, String)]
      .collect().sorted.toList
    val got = joined.select("k", "row_id", "v")
      .as[(Long, Long, String)].collect().sorted.toList
    assert(got === expect)
  }
}
