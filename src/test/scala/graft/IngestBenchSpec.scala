package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the quarantine-probe workload seeding: the dirty-file stripe
  * must be DETERMINISTIC (reruns comparable) and EXACT (pct dirty
  * files per 100 indices) — the probe's quarantine_share claim and its
  * routing requires both divide by these counts.
  */
class IngestBenchSpec extends AnyFunSuite {

  test("isDirty stripes exactly pct dirty files per 100 indices") {
    for (pct <- Seq(1, 10, 30, 50, 100)) {
      val dirty = (1 to 100).count(IngestBench.isDirty(_, pct))
      assert(dirty === pct, s"pct=$pct")
      // and per every consecutive block of 100
      val dirty2 = (101 to 200).count(IngestBench.isDirty(_, pct))
      assert(dirty2 === pct, s"pct=$pct second block")
    }
    assert((1 to 1000).count(IngestBench.isDirty(_, 30)) === 300)
    assert(!(1 to 100).exists(IngestBench.isDirty(_, 0)))
    // deterministic: same index, same verdict
    assert(IngestBench.isDirty(4, 30) && IngestBench.isDirty(7, 30))
  }
}
