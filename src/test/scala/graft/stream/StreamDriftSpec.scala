package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamDriftSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch PSI matches the batch operator; stable batches score 0") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("sdrift").toString
    val ckpt = Files.createTempDirectory("sdrift-ckpt").toString
    val reference = (Seq.fill(80)(1.0) ++ Seq.fill(20)(20.0)).toDF("v")
    val mem = MemoryStream[Double]
    val q = StreamDrift.monitor(
      mem.toDF().toDF("v"), reference, "v", width = 16L, out, ckpt)
    try {
      // batch 0: same 80/20 shape as the reference -> psi 0
      mem.addData(Seq.fill(8)(1.0) ++ Seq.fill(2)(20.0): _*)
      q.processAllAvailable()
      // batch 1: inverted 20/80 shape -> the known two-bin PSI
      mem.addData(Seq.fill(2)(1.0) ++ Seq.fill(8)(20.0): _*)
      q.processAllAvailable()
      val log = spark.read.parquet(out)
        .select("batch_id", "psi_micro12").as[(Long, Long)].collect().toMap
      assert(log(0L) == 0L)
      val expected = graft.ext.Drift.psi(
          reference,
          (Seq.fill(2)(1.0) ++ Seq.fill(8)(20.0)).toDF("v"),
          "v", width = 16L)
        .select("psi_micro12").as[Long].head()
      assert(log(1L) == expected && expected > 250000000000L)
    } finally q.stop()
  }

  test("psiFromBinnedRef on a pre-binned reference equals psi, and the " +
    "monitor releases its reference cache on termination") {
    implicit val sqlCtx = spark.sqlContext
    val ref = (Seq.fill(60)(3.0) ++ Seq.fill(40)(50.0)).toDF("v")
    val cur = (Seq.fill(10)(3.0) ++ Seq.fill(30)(50.0)).toDF("v")
    val direct = graft.ext.Drift.psi(ref, cur, "v", width = 16L)
      .as[(Long, Long, Long, Long)].head()
    val binned = graft.ext.Drift.psiFromBinnedRef(
      graft.ext.Drift.binCounts(ref, "v", 16L, "n_ref"),
      cur, "v", width = 16L).as[(Long, Long, Long, Long)].head()
    assert(direct === binned)

    val before = spark.sparkContext.getPersistentRDDs.size
    val out = Files.createTempDirectory("sdrift2").toString
    val ckpt = Files.createTempDirectory("sdrift2-ckpt").toString
    val mem = MemoryStream[Double]
    val q = StreamDrift.monitor(
      mem.toDF().toDF("v"), ref, "v", width = 16L, out, ckpt)
    try {
      mem.addData(3.0, 50.0)
      q.processAllAvailable()
      assert(spark.sparkContext.getPersistentRDDs.size > before)
    } finally q.stop()
    q.awaitTermination()
    // listener fires asynchronously after termination
    val deadline = System.nanoTime() + 10_000_000_000L
    while (spark.sparkContext.getPersistentRDDs.size > before &&
      System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.size === before)
  }
}
