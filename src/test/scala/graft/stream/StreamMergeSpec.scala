package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamMergeSpec extends SparkSpec {
  import spark.implicits._

  // (k, name, v, del, seq)
  private type Chg = (Long, String, Double, Boolean, Long)

  private def snapshot(root: String): Set[(Long, String, Double)] =
    StreamMerge.currentSnapshotDir(root) match {
      case Some(dir) => spark.read.parquet(dir)
        .as[(Long, String, Double)].collect().toSet
      case None => Set.empty
    }

  test("streaming CDC apply maintains the snapshot across batches") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("smerge").toString
    val ckpt = Files.createTempDirectory("smerge-ckpt").toString
    val mem = MemoryStream[Chg]
    val q = StreamMerge.start(
      mem.toDF().toDF("k", "name", "v", "del", "seq"),
      Seq("k"), "del", "seq", root, ckpt)
    try {
      // batch 1: two inserts + an intra-batch overwrite of k=1
      // (seq 11 beats seq 10: last-write-wins collapse)
      mem.addData(
        (1L, "a-stale", 1.0, false, 10L),
        (1L, "a", 1.5, false, 11L),
        (2L, "b", 2.0, false, 12L))
      q.processAllAvailable()
      assert(snapshot(root) == Set((1L, "a", 1.5), (2L, "b", 2.0)))

      // batch 2: update k=2, delete k=1, insert k=3
      mem.addData(
        (2L, "b2", 2.5, false, 20L),
        (1L, "a", 0.0, true, 21L),
        (3L, "c", 3.0, false, 22L))
      q.processAllAvailable()
      assert(snapshot(root) ==
        Set((2L, "b2", 2.5), (3L, "c", 3.0)))

      // batch 3: delete of a missing key is a no-op
      mem.addData((9L, "x", 0.0, true, 30L))
      q.processAllAvailable()
      assert(snapshot(root) ==
        Set((2L, "b2", 2.5), (3L, "c", 3.0)))
    } finally q.stop()
  }

  test("restart from checkpoint applies only unseen change files and converges") {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("smerge3").toString
    val ckpt = Files.createTempDirectory("smerge3-ckpt").toString
    val in = Files.createTempDirectory("smerge3-in").toString
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("name", StringType),
      StructField("v", DoubleType), StructField("del", BooleanType),
      StructField("seq", LongType)))
    def changeStream = spark.readStream.schema(schema)
      .json(in).toDF("k", "name", "v", "del", "seq")
    def run(): Unit = {
      val q = StreamMerge.start(changeStream, Seq("k"), "del", "seq", root, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    Files.writeString(java.nio.file.Paths.get(in, "c1.json"),
      """{"k":1,"name":"a","v":1.0,"del":false,"seq":10}
        |{"k":2,"name":"b","v":2.0,"del":false,"seq":11}""".stripMargin)
    run()
    assert(snapshot(root) == Set((1L, "a", 1.0), (2L, "b", 2.0)))
    // second generation, same checkpoint: c1 must NOT be re-consumed,
    // c2 updates k=1 and deletes k=2
    Files.writeString(java.nio.file.Paths.get(in, "c2.json"),
      """{"k":1,"name":"a2","v":1.5,"del":false,"seq":20}
        |{"k":2,"name":"b","v":0.0,"del":true,"seq":21}""".stripMargin)
    run()
    assert(snapshot(root) == Set((1L, "a2", 1.5)))
  }

  test("delete + reinsert of a key in one tick resolves deterministically") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("smerge2").toString
    val ckpt = Files.createTempDirectory("smerge2-ckpt").toString
    val mem = MemoryStream[Chg]
    val q = StreamMerge.start(
      mem.toDF().toDF("k", "name", "v", "del", "seq"),
      Seq("k"), "del", "seq", root, ckpt)
    try {
      // same seq for delete and reinsert: the delete-flag tiebreak
      // picks the delete — a full tick is (delete, then reinsert at a
      // LATER seq), which survives
      mem.addData(
        (1L, "gone", 1.0, true, 10L),
        (1L, "gone", 1.0, false, 10L),
        (2L, "kept", 2.0, true, 20L),
        (2L, "kept-v2", 2.5, false, 21L))
      q.processAllAvailable()
      assert(snapshot(root) == Set((2L, "kept-v2", 2.5)))
    } finally q.stop()
  }
}
