package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.Ordinal

/** P1/P2/P4/P5, K2/K6 + the distributed ordinal underneath them. */
class PrepSpec extends SparkSpec {
  import spark.implicits._

  test("global row number equals rank of the order key, any partitioning") {
    val df = spark.range(0, 2017).toDF("id")
      .repartition(7) // scramble
    val rn = Ordinal.withGlobalRowNumber(df, Seq(col("id")), "rn")
    assert(rn.filter(col("rn") =!= col("id") + 1).count() === 0)
  }

  test("global row number preserves nullable strings/doubles through the unsafe projection") {
    val df = Seq(
      (3L, "c", Option(1.5)), (1L, "a", Option.empty[Double]),
      (2L, null.asInstanceOf[String], Option(2.0)))
      .toDF("id", "s", "v").repartition(5)
    val rows = Ordinal.withGlobalRowNumber(df, Seq(col("id")), "rn")
      .orderBy("rn")
      .as[(Long, String, Option[Double], Long)].collect().toSeq
    assert(rows === Seq(
      (1L, "a", None, 1L), (2L, null, Some(2.0), 2L), (3L, "c", Some(1.5), 3L)))
  }

  test("global row number of an empty frame is empty with the extra column") {
    val out = Ordinal.withGlobalRowNumber(
      spark.range(0).toDF("id"), Seq(col("id")), "rn")
    assert(out.columns.toSeq === Seq("id", "rn"))
    assert(out.count() === 0)
  }

  test("roundRobinTag cycles ids by row position") {
    val out = Prep.roundRobinTag(
      spark.range(0, 10).toDF("id"), Seq("a", "b", "c"), col("id"), "tag")
      .orderBy("id").select("tag").as[String].collect()
    assert(out.toSeq === Seq("a", "b", "c", "a", "b", "c", "a", "b", "c", "a"))
  }

  test("chunkSplit assigns floor((pos-1)/n) in key order") {
    val out = Prep.chunkSplit(
      spark.range(0, 10).toDF("id"), chunkRows = 4, col("id"), "chunk")
      .orderBy("id").select("chunk").as[Long].collect()
    assert(out.toSeq === Seq(0L, 0, 0, 0, 1, 1, 1, 1, 2, 2))
  }

  test("renameProject renames and reorders") {
    val df = Seq((1, "x")).toDF("a", "b")
    val out = Prep.renameProject(df, Seq("a" -> "id", "b" -> "name"),
      Seq("name", "id"))
    assert(out.columns.toSeq === Seq("name", "id"))
  }

  test("tsParseFormat formats to seconds precision") {
    val out = Seq(java.sql.Timestamp.valueOf("2024-03-01 10:11:12.987"))
      .toDF("ts").select(Prep.tsParseFormat(col("ts")).as("f"))
      .as[String].head()
    assert(out === "2024-03-01 10:11:12")
  }

  test("upsertLatest keeps exactly the newest row per key") {
    val df = Seq(
      ("k1", 1L, "old"), ("k1", 3L, "new"), ("k1", 2L, "mid"),
      ("k2", 5L, "only"))
      .toDF("k", "v", "payload")
    val out = Prep.upsertLatest(df, Seq("k"), Seq(col("v")))
      .select("k", "payload").as[(String, String)].collect().toSet
    assert(out === Set(("k1", "new"), ("k2", "only")))
  }
}
