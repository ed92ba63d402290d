package graft.sink

import java.nio.file.Files

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compactDir bin-packs small files and preserves content exactly") {
    val src = Files.createTempDirectory("compact-src").toString
    val dest = Files.createTempDirectory("compact-dest").toString + "/out"
    // 16 tiny files
    spark.range(0, 1000).select($"id", ($"id" * 2).as("v"))
      .repartition(16)
      .write.mode("overwrite").parquet(src)
    val (in, out) = Compaction.compactDir(
      spark, src, dest, targetBytes = 1L << 20)
    assert(in == 16 && out < in && out >= 1)
    val before = spark.read.parquet(src)
      .as[(Long, Long)].collect().sorted.toSeq
    val after = spark.read.parquet(dest)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(after == before)
  }

  test("compactDir copies already-large files without rewriting them") {
    val src = Files.createTempDirectory("compact-src2").toString
    val dest = Files.createTempDirectory("compact-dest2").toString + "/out"
    spark.range(0, 50000).select($"id", ($"id" % 97).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(src)
    spark.range(50000, 50100).select($"id", ($"id" % 97).as("v"))
      .coalesce(1).write.mode("append").parquet(src)
    // big file stays (copied as kept-*), tiny one is rewritten
    val (in, out) = Compaction.compactDir(
      spark, src, dest, targetBytes = 50000L)
    assert(in == 2 && out == 2)
    val names = new java.io.File(dest).list().toSeq
    assert(names.exists(_.startsWith("kept-")))
    assert(names.exists(_.startsWith("bin-")))
    assert(spark.read.parquet(dest).count() == 50100)
  }
}
