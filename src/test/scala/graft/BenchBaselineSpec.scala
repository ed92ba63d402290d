package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's contention-defense baseline selection: numeric round
  * ordering of driver reports (lexicographic sorting ranked
  * BENCH_r9.json above BENCH_r13.json once rounds hit two digits) and
  * the per-query MIN merge across candidate maps (a delta visible in
  * EITHER the full map or the last driver report must arm the 2.5×
  * re-time — r13 shipped two >2× deltas the defense never saw because
  * it was armed only against BENCH_FULL.json).
  */
class BenchBaselineSpec extends AnyFunSuite {

  test("latest round report is picked by round NUMBER, not name order") {
    val names = Seq(
      "BENCH_r9.json", "BENCH_r13.json", "BENCH_r2.json",
      "BENCH_FULL.json", "CORRECTNESS_r13.json", "notes.txt")
    assert(Bench.latestRoundReport(names) === Some("BENCH_r13.json"))
    // two-digit vs one-digit is exactly the case lexicographic broke
    assert(Bench.latestRoundReport(Seq("BENCH_r10.json", "BENCH_r9.json"))
      === Some("BENCH_r10.json"))
    assert(Bench.latestRoundReport(Seq("BENCH_FULL.json")) === None)
    assert(Bench.latestRoundReport(Nil) === None)
  }

  test("noise floor: median control ratio vs all-time min, floored at 1") {
    val base = Map("q_scan_cast" -> 0.2, "q_agg_metrics" -> 0.4)
    // median of 3 samples, per control; max across controls
    val hot = Bench.noiseFloor(
      Map("q_scan_cast" -> Seq(0.6, 0.4, 5.0), // median 0.6 → 3.0×
        "q_agg_metrics" -> Seq(0.4, 0.5, 0.6)), // median 0.5 → 1.25×
      base)
    assert(hot.exists(f => math.abs(f - 3.0) < 1e-9))
    // a control FASTER than its all-time min reads 1.0, not <1
    val quiet = Bench.noiseFloor(Map("q_scan_cast" -> Seq(0.1, 0.1, 0.1)), base)
    assert(quiet === Some(1.0))
    // no control has a baseline → None (plain 2× rule downstream)
    assert(Bench.noiseFloor(Map("q_scan_cast" -> Seq(1.0)), Map.empty) === None)
    assert(Bench.noiseFloor(Map.empty, base) === None)
  }

  test("unresolved: re-timed min must clear max(2x baseline, 2x noise floor)") {
    // quiet session: > 2× baseline and > 2 s absolute → unresolved
    assert(Bench.unresolvedRatio(6.0, Some(2.0), Some(1.0))
      .exists(r => math.abs(r - 3.0) < 1e-9))
    // hot session (floor 2.5×): the SAME 3× reading is inside the
    // weather band — 2×2.5 = 5× bar — so it is NOT marked
    assert(Bench.unresolvedRatio(6.0, Some(2.0), Some(2.5)) === None)
    // but a 6× reading clears even the hot bar
    assert(Bench.unresolvedRatio(12.0, Some(2.0), Some(2.5)).isDefined)
    // absolute floor: 1.9 s is never unresolved whatever the ratio
    assert(Bench.unresolvedRatio(1.9, Some(0.1), Some(1.0)) === None)
    // no baseline → nothing to resolve against
    assert(Bench.unresolvedRatio(10.0, None, Some(1.0)) === None)
    // missing floor falls back to the plain 2× rule
    assert(Bench.unresolvedRatio(6.0, Some(2.0), None).isDefined)
  }

  test("effectiveFloor: many-job widening applies only past the job threshold") {
    // many-job query on a scheduler-hot box: widened to the larger floor
    assert(Bench.effectiveFloor(Some(1.2), Some(3.0), Some(10L)) === Some(3.0))
    // max of the two floors, never a replacement (a byte-weather-hot
    // box with quiet scheduling keeps the single-job floor)
    assert(Bench.effectiveFloor(Some(3.0), Some(1.2), Some(10L)) === Some(3.0))
    // single-job query must NOT inherit scheduler-weather widening
    assert(Bench.effectiveFloor(Some(1.2), Some(3.0), Some(2L)) === Some(1.2))
    // exactly at the threshold counts as many-job
    assert(Bench.effectiveFloor(
      Some(1.2), Some(3.0), Some(Bench.manyJobThreshold)) === Some(3.0))
    // missing pieces degrade to whatever floor exists
    assert(Bench.effectiveFloor(None, Some(2.0), Some(10L)) === Some(2.0))
    assert(Bench.effectiveFloor(None, Some(2.0), Some(1L)) === None)
    assert(Bench.effectiveFloor(Some(1.5), None, Some(10L)) === Some(1.5))
    assert(Bench.effectiveFloor(None, None, None) === None)
    // unknown job count (query absent from the first pass): no widening
    assert(Bench.effectiveFloor(Some(1.5), Some(3.0), None) === Some(1.5))
  }

  test("many-job control launches enough jobs to read scheduler weather") {
    val spark = SparkTestSession.spark
    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      Bench.manyJobShape(spark, "/root/testdata/sf0.001")
      // listener bus is async — poll briefly for the posts to land
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (jobs.get() < 10L && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(jobs.get() >= 10L,
        s"many-job control launched ${jobs.get()} jobs; need >= 10")
      assert(jobs.get() >= Bench.manyJobThreshold)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("baseline merge takes the per-query minimum across maps") {
    val full = Map("q_a" -> 2.0, "q_b" -> 0.5, "q_c" -> 1.0)
    val report = Map("q_a" -> 0.8, "q_b" -> 1.5, "q_d" -> 3.0)
    val merged = Bench.mergeBaselines(List(full, report))
    assert(merged === Map(
      "q_a" -> 0.8, // report saw it faster — that delta must arm
      "q_b" -> 0.5, // full map saw it faster
      "q_c" -> 1.0, // only in the full map
      "q_d" -> 3.0)) // only in the driver report
    assert(Bench.mergeBaselines(Nil) === Map.empty)
    assert(Bench.mergeBaselines(List(full)) === full)
  }
}
