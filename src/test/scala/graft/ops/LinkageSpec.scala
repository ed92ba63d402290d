package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, "acme corp", "US"),
    (2L, "globex inc", "US"),
    (3L, "initech", "DE")
  ).toDF("lid", "lname", "lblock")

  private def link(right: org.apache.spark.sql.DataFrame, threshold: Double) =
    Linkage.scoredLink(
      left, right, Seq("lblock" -> "rblock"), "lid", "rid",
      Seq(1.0 -> Linkage.nameSimilarity(col("lname"), col("rname"), 2)),
      threshold)

  test("scoredLink matches typo'd names inside a block, exact names at 1.0") {
    val right = Seq(
      (11L, "acme c0rp", "US"),  // 1 substitution vs lid 1
      (12L, "globex inc", "US"), // exact vs lid 2
      (13L, "wholly different", "US")
    ).toDF("rid", "rname", "rblock")
    val out = link(right, threshold = 0.85)
      .as[(Long, Long, Double)].collect().toSet
    val sim1 = math.rint((1.0 - 1.0 / 9.0) * 1e6) / 1e6
    assert(out == Set((1L, 11L, sim1), (2L, 12L, 1.0)))
  }

  test("scoredLink never sees cross-block pairs (blocking recall trade)") {
    val right = Seq((21L, "initech", "US")).toDF("rid", "rname", "rblock")
    // identical name, wrong block ("initech" is DE on the left): the
    // pair is never generated, so no score clears any real threshold
    assert(link(right, threshold = 0.5).count() == 0)
  }

  test("nameSimilarity handles empty strings and the band cutoff") {
    val df = Seq(
      ("", "", 1.0),          // both empty: defined as 1.0
      ("abc", "xyz", 0.0),    // distance 3 > band 2: scores 0
      ("abcd", "abXd", 0.75)  // 1 - 1/4
    ).toDF("a", "b", "expected")
    val got = df.select(
      Linkage.nameSimilarity(col("a"), col("b"), 2).as("s"), col("expected"))
      .as[(Double, Double)].collect()
    got.foreach { case (s, e) => assert(s == e) }
  }

  test("candidates come from an equi-join on the block key, never a pair scan") {
    val right = Seq((11L, "acme corp", "US")).toDF("rid", "rname", "rblock")
    val plan = link(right, 0.5).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"), plan)
  }

  test("goldenRecords: field survivorship — trusted null falls " +
    "through, all-null stays null, unpaired records pass through") {
    val records = Seq(
      // entity {1,2}: rec 1 trusted (p=2) but has null city;
      // rec 2 lesser (p=1) with a real city and a worse name
      (1L, 2L, "Alice Smith", Option.empty[String], Some(10.0)),
      (2L, 1L, "alice smyth", Some("Berlin"), Some(11.5)),
      // entity {3,4}: city null in BOTH members -> survives as null
      (3L, 2L, "Bob", Option.empty[String], Some(1.0)),
      (4L, 1L, "Bobby", Option.empty[String], Option.empty[Double]),
      // unpaired record: passes through as its own entity
      (9L, 1L, "Solo", Some("Oslo"), Some(7.0)))
      .toDF("rec_id", "priority", "name", "city", "bal")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val out = Linkage.goldenRecords(
      records, "rec_id", "priority", pairs, "a", "b",
      Seq("name", "city", "bal"))
      .as[(Long, Long, String, Option[String], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 2L, "Alice Smith", Some("Berlin"), Some(10.0))))
    assert(out(3L) === ((3L, 2L, "Bob", None, Some(1.0))))
    assert(out(9L) === ((9L, 1L, "Solo", Some("Oslo"), Some(7.0))))
  }

  test("goldenRecords: equal priority ties break by lowest member id") {
    val records = Seq(
      (5L, 1L, "first"), (6L, 1L, "second"))
      .toDF("rec_id", "priority", "name")
    val out = Linkage.goldenRecords(
      records, "rec_id", "priority",
      Seq((5L, 6L)).toDF("a", "b"), "a", "b", Seq("name"))
      .as[(Long, Long, String)].head()
    assert(out === ((5L, 2L, "first")))
  }
}
