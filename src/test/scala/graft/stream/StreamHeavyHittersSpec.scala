package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // One bucket so the SpaceSaving invariants are checked against the
  // full stream; production shards by md5 bucket.
  private def run(batches: Seq[Seq[String]], m: Int): Map[String, (Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamHeavyHitters.track(
      mem.toDF().toDF("key"), m = m, buckets = 1)
      .writeStream.outputMode("append")
      .format("memory").queryName("hh_out").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // latest row per key = the post-batch state (count is monotone)
      spark.table("hh_out").as[(Long, String, Long, Long)].collect()
        .groupBy(_._2).view
        .mapValues(rs => { val r = rs.maxBy(_._3); (r._3, r._4) }).toMap
    } finally {
      q.stop()
      spark.catalog.dropTempView("hh_out")
    }
  }

  test("exact counts while capacity lasts; hot keys tracked across " +
    "batches") {
    val out = run(Seq(
      Seq("a", "a", "b", "c"),
      Seq("a", "b", "a")), m = 8)
    assert(out("a") === ((4L, 0L)))
    assert(out("b") === ((2L, 0L)))
    assert(out("c") === ((1L, 0L)))
  }

  test("eviction inherits the min count as the error bound; " +
    "count >= true >= count - error") {
    // m=2: 'a' hot, 'b' warm, then 'z' arrives and evicts the min.
    val out = run(Seq(
      Seq("a", "a", "a", "b"),
      Seq("z")), m = 2)
    // z inherited b's count 1 -> (count 2, err 1); true z count is 1:
    // count(2) >= true(1) >= count-error(1)
    assert(out("z") === ((2L, 1L)))
    assert(out("a") === ((3L, 0L)))
    // conservation: sum of live counts == items seen (5)
    // (b's counter was reassigned to z; a=3 + z=2)
    assert(out("a")._1 + out("z")._1 === 5L)
  }

  test("in-batch arrival order does not change the summary") {
    val out1 = run(Seq(Seq("x", "y", "x", "z", "x")), m = 2)
    val out2 = run(Seq(Seq("z", "x", "x", "y", "x")), m = 2)
    assert(out1 === out2)
  }

  test("a key inserted then evicted WITHIN a batch emits no stale row, " +
    "and null keys don't poison the query") {
    // m=2, one batch, key order a < b < c < d: a(5) and b(7) fill
    // capacity; c evicts a (min 5) -> (6,5); d then evicts c (new min
    // 6) -> (7,6). Post-batch state is {b, d} — a per-update emission
    // would have published a stale c=(6,5) that a latest-row-per-key
    // view double-counts alongside d's inherited 7.
    val rows =
      Seq.fill(5)("a") ++ Seq.fill(7)("b") ++ Seq("c", "d", null)
    val out = run(Seq(rows), m = 2)
    assert(!out.contains("c"), out.toString)
    assert(out("b") === ((7L, 0L)))
    assert(out("d") === ((7L, 6L)))
    assert(!out.contains(null))
  }
}
