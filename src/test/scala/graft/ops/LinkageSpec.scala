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
}
