package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.sink.VersionedLake

class StreamLakeSinkSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(pfx: String): String =
    java.nio.file.Files.createTempDirectory(pfx).toString

  test("stream commits one lake version per micro-batch; time travel " +
    "lands on batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val path = fresh("graft_slake")
    val ckpt = fresh("graft_slake_ck")
    val mem = MemoryStream[(Long, String)]
    val q = StreamLakeSink.start(
      mem.toDF().toDF("id", "v"), path, ckpt)
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
      assert(VersionedLake.versions(path).length === 2)
      assert(VersionedLake.read(spark, path, Some(1L))
        .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
      assert(VersionedLake.read(spark, path)
        .as[(Long, String)].collect().toSet ===
        Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }

  test("a replayed batch id commits nothing (exactly-once under " +
    "foreachBatch redelivery)") {
    val path = fresh("graft_slake2")
    val b0 = Seq((1L, "a")).toDF("id", "v")
    assert(StreamLakeSink.commitBatch(b0, path, batchId = 0L) === Some(1L))
    // crash-replay: same batch id, possibly different (reprocessed)
    // frame contents — must be a no-op
    assert(StreamLakeSink.commitBatch(b0, path, 0L) === None)
    assert(StreamLakeSink.commitBatch(
      Seq((1L, "a"), (9L, "x")).toDF("id", "v"), path, 0L) === None)
    assert(VersionedLake.versions(path) === Seq(1L))
    assert(StreamLakeSink.commitBatch(
      Seq((2L, "b")).toDF("id", "v"), path, 1L) === Some(2L))
    assert(VersionedLake.read(spark, path)
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
    // empty batches never commit
    assert(StreamLakeSink.commitBatch(
      Seq.empty[(Long, String)].toDF("id", "v"), path, 2L) === None)
  }

  test("a twin's commit landing after the cache was warmed is still " +
    "seen (incremental rescan), and stale bases conflict loudly") {
    val path = fresh("graft_slake3")
    assert(StreamLakeSink.commitBatch(
      Seq((1L, "a")).toDF("id", "v"), path, 0L) === Some(1L))
    // warm this driver's scan cache, then simulate the replay TWIN
    // committing batch 1 directly through the lake
    assert(!StreamLakeSink.batchCommitted(path, 1L))
    VersionedLake.commit(Seq((2L, "twin")).toDF("id", "v"), path,
      overwrite = false, dataDirPrefix = "b1-")
    // our own batch-1 commit must now be a no-op, not a duplicate
    assert(StreamLakeSink.commitBatch(
      Seq((2L, "ours")).toDF("id", "v"), path, 1L) === None)
    assert(VersionedLake.read(spark, path).as[(Long, String)]
      .collect().toSet === Set((1L, "a"), (2L, "twin")))
    // and the precondition commitBatch relies on: a commit with a
    // stale expectedBase throws instead of silently stacking
    intercept[VersionedLake.CommitConflictException] {
      VersionedLake.commit(Seq((9L, "x")).toDF("id", "v"), path,
        overwrite = false, expectedBase = Some(1L))
    }
  }
}
