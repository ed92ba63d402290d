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
