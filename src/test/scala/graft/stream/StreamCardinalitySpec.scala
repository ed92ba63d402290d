package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamCardinalitySpec extends SparkSpec {
  import spark.implicits._

  test("streaming HLL estimate equals the batch sketch bit-exactly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val df = mem.toDF().toDF("g", "v")

    val q = StreamCardinality.approxDistinct(spark, df, "g", "v")
      .writeStream.outputMode("update")
      .format("memory").queryName("hll_out").start()
    try {
      mem.addData((1L to 400L).map(i => ("a", i)): _*)
      q.processAllAvailable()
      mem.addData((200L to 900L).map(i => ("a", i)): _*) // overlap + growth
      mem.addData((1L to 50L).map(i => ("b", i)): _*)
      q.processAllAvailable()

      // latest streaming estimate per group
      val streamed = spark.table("hll_out")
        .groupBy("group").agg(org.apache.spark.sql.functions.last("approx_distinct").as("e"))
        .as[(String, Double)].collect().toMap

      // batch sketch over the identical full history
      val history = ((1L to 900L).map(i => ("a", i)) ++
        (1L to 50L).map(i => ("b", i))).toDF("g", "v")
      val batch = graft.ext.Sketches.approxDistinct(history, Seq("g"), "v")
        .as[(String, Double)].collect().toMap

      assert(streamed === batch) // EXACT double equality, both groups
    } finally q.stop()
  }

  test("duplicates across batches leave the estimate unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val df = mem.toDF().toDF("g", "v")
    val q = StreamCardinality.approxDistinct(spark, df, "g", "v")
      .writeStream.outputMode("update")
      .format("memory").queryName("hll_dup_out").start()
    try {
      mem.addData((1L to 300L).map(i => ("a", i)): _*)
      q.processAllAvailable()
      val first = spark.table("hll_dup_out")
        .orderBy($"approx_distinct").as[(String, Double)].collect().last._2
      mem.addData((1L to 300L).map(i => ("a", i)): _*) // pure replay
      q.processAllAvailable()
      val second = spark.table("hll_dup_out")
        .groupBy("group").agg(org.apache.spark.sql.functions.last("approx_distinct"))
        .as[(String, Double)].collect().head._2
      assert(first === second)
    } finally q.stop()
  }

  test("scala md5 prefix mirrors the SQL expression") {
    val vals = Seq("", "a", "hello world", "Ünïcødé ✓", "12345")
    val sql = vals.toDF("s")
      .select(graft.functions.HashExprs.md5Prefix60($"s"))
      .as[Long].collect().toSeq
    assert(sql === vals.map(StreamCardinality.md5Prefix60))
  }
}
