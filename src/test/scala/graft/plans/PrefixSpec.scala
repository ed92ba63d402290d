package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class PrefixSpec extends SparkSpec {
  import spark.implicits._

  test("withRunningSum matches the single-partition window cumsum") {
    val df = spark.range(0, 5000, 1, 16)
      .select($"id", (($"id" * 31) % 100 + 1).as("v"))
    val expected = df
      .withColumn("cum", sum($"v").over(
        Window.orderBy($"id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    val got = Prefix.withRunningSum(df, Seq($"id"), "v", "cum", Some(8))
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("withRunningSum preserves all columns and row count; empty input ok") {
    val df = Seq((3L, 10L, "x"), (1L, 5L, "y"), (2L, 7L, "z")).toDF("id", "v", "s")
    val out = Prefix.withRunningSum(df, Seq($"id"), "v", "cum")
      .orderBy("id").as[(Long, Long, String, Long)].collect().toList
    assert(out === List((1L, 5L, "y", 5L), (2L, 7L, "z", 12L), (3L, 10L, "x", 22L)))
    val empty = Prefix.withRunningSum(
      df.filter($"id" > 100), Seq($"id"), "v", "cum")
    assert(empty.count() === 0)
  }

  test("packBins assigns bins by start offset; straddling docs keep their start bin") {
    // budgets of 10: docs of 4 tokens each -> starts 0,4,8,12,16,...
    val df = spark.range(0, 6).select($"id", lit(4L).as("n_tok"))
    val out = Prefix.packBins(df, Seq($"id"), "n_tok", 10L)
      .select($"id", $"cum_tokens", $"bin_id").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toList
    // starts: 0,4,8,12,16,20 -> bins 0,0,0,1,1,2 (doc 2 straddles 8..12)
    assert(out === List((0L, 4L, 0L), (1L, 8L, 0L), (2L, 12L, 0L),
      (3L, 16L, 1L), (4L, 20L, 1L), (5L, 24L, 2L)))
  }
}
