package graft.sink

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraftLakeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val grid = (for { x <- 0 until 128; y <- 0 until 128 }
    yield (x.toLong, y.toLong, x * 128L + y)).toDF("dim_a", "dim_b", "payload")

  private def freshLake(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lake").toString
    GraftLake.writeIndexed(grid, dir, "dim_a", "dim_b", files = 16, bits = 7)
    dir
  }

  test("scanPruned returns exactly the full-scan filter result while " +
    "skipping most files — on BOTH dimensions") {
    val dir = freshLake()
    for (dim <- Seq("dim_a", "dim_b")) {
      val (df, report) = GraftLake.scanPruned(
        spark, dir, Map(dim -> ((10L, 20L))))
      val got = df.select("dim_a", "dim_b", "payload")
        .as[(Long, Long, Long)].collect().toSet
      val expect = grid.filter(col(dim).between(10, 20))
        .as[(Long, Long, Long)].collect().toSet
      assert(got === expect)
      assert(report.totalFiles === 16L)
      // An 11/128 slice of either dim must prune well under z-order;
      // a linear layout would keep all 16 for the non-leading dim.
      assert(report.keptFiles < report.totalFiles / 2,
        s"$dim kept ${report.keptFiles}/${report.totalFiles}")
    }
  }

  test("scanPruned intersects multi-dimension ranges and survives an " +
    "empty result") {
    val dir = freshLake()
    val (df, report) = GraftLake.scanPruned(
      spark, dir, Map("dim_a" -> ((0L, 7L)), "dim_b" -> ((0L, 7L))))
    val got = df.select("dim_a", "dim_b").as[(Long, Long)].collect().toSet
    assert(got === (for { x <- 0L until 8L; y <- 0L until 8L }
      yield (x, y)).toSet)
    assert(report.keptFiles >= 1L && report.keptFiles < 16L)
    // Out-of-domain range: zero files kept, empty result, schema intact.
    val (none, r0) = GraftLake.scanPruned(
      spark, dir, Map("dim_a" -> ((1000L, 2000L))))
    assert(r0.keptFiles === 0L && none.count() === 0L)
    assert(none.columns.toSet === Set("dim_a", "dim_b", "payload"))
  }

  test("the sidecar is invisible to a plain parquet read of the lake") {
    val dir = freshLake()
    assert(spark.read.parquet(dir).count() === grid.count())
  }

  test("bloom sidecar: point lookup returns the exact rows, prunes " +
    "most files, and never false-negatives") {
    val dir = freshLake()
    GraftLake.writeBloomSidecar(spark, dir, "payload",
      mBits = 4096, hashes = 3)
    // Every probed key must return its exact row (no false negatives
    // by construction — the property worth asserting over many keys).
    var keptTotal = 0L
    val probes = Seq(0L, 17L, 4095L, 9999L, 16383L)
    probes.foreach { key =>
      val (df, report) = GraftLake.scanPrunedByKey(
        spark, dir, "payload", key.toString, mBits = 4096, hashes = 3)
      val got = df.select("payload").as[Long].collect().toList
      assert(got === List(key), s"key $key")
      assert(report.totalFiles === 16L)
      keptTotal += report.keptFiles
    }
    // A point key lives in ONE file; false positives may add a few,
    // but across 5 probes the average must stay far below full scan.
    assert(keptTotal < 5 * 8, s"kept $keptTotal files across 5 probes")
    // An absent key: usually zero files (bloom may false-positive a
    // file, never a row) — the ROW result must be empty regardless.
    val (none, _) = GraftLake.scanPrunedByKey(
      spark, dir, "payload", "123456789", mBits = 4096, hashes = 3)
    assert(none.count() === 0L)
  }
}
