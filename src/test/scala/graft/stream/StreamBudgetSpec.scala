package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamBudgetSpec extends SparkSpec {
  import spark.implicits._

  test("per-source budgets enforce whole-doc admission across " +
    "micro-batches; rejection is permanent once the budget is spent") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = StreamBudget
      .gate(mem.toDF().toDF("source", "doc_id", "n_tokens"), budget = 100L)
      .writeStream.outputMode("append")
      .format("memory").queryName("budget_out").start()
    try {
      // Batch 1: src-a spends 90/100; src-b spends 60/100.
      mem.addData(("a", 1L, 50L), ("a", 2L, 40L), ("b", 10L, 60L))
      q.processAllAvailable()
      // Batch 2: a's 20-token doc no longer fits (90+20>100) but a
      // later 10-token doc does; b's 40-token doc exactly fits.
      mem.addData(("a", 3L, 20L), ("a", 4L, 10L), ("b", 11L, 40L))
      q.processAllAvailable()
      // Batch 3: both sources exhausted -> everything rejected.
      mem.addData(("a", 5L, 1L), ("b", 12L, 1L))
      q.processAllAvailable()

      val out = spark.table("budget_out")
        .as[(String, Long, Long, Boolean, Long)]
        .collect().map(r => (r._1, r._2) -> ((r._4, r._5))).toMap
      assert(out(("a", 1L)) === ((true, 50L)))
      assert(out(("a", 2L)) === ((true, 90L)))
      assert(out(("b", 10L)) === ((true, 60L)))
      assert(out(("a", 3L)) === ((false, 90L)), "20 tokens can't fit in 10")
      assert(out(("a", 4L)) === ((true, 100L)), "10 tokens exactly fit")
      assert(out(("b", 11L)) === ((true, 100L)))
      assert(out(("a", 5L)) === ((false, 100L)))
      assert(out(("b", 12L)) === ((false, 100L)))
    } finally q.stop()
  }

  test("in-batch admission is doc_id-ordered, so verdicts don't depend " +
    "on arrival order within a micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val q = StreamBudget
      .gate(mem.toDF().toDF("source", "doc_id", "n_tokens"), budget = 70L)
      .writeStream.outputMode("append")
      .format("memory").queryName("budget_out2").start()
    try {
      // Arrival order 3,1,2 — admission folds 1(40),2(30),3(rejected).
      mem.addData(("s", 3L, 30L), ("s", 1L, 40L), ("s", 2L, 30L))
      q.processAllAvailable()
      val out = spark.table("budget_out2")
        .as[(String, Long, Long, Boolean, Long)]
        .collect().map(r => r._2 -> r._4).toMap
      assert(out === Map(1L -> true, 2L -> true, 3L -> false))
    } finally q.stop()
  }
}
