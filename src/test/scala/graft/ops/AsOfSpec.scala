package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 1.0),
    ("A", ts("2024-01-01 12:00:00"), 2.0),
    ("B", ts("2024-01-01 11:00:00"), 9.0))
    .toDF("k", "qts", "rate")

  private lazy val events = Seq(
    (1L, "A", ts("2024-01-01 09:59:59")), // before any quote -> null
    (2L, "A", ts("2024-01-01 10:00:00")), // exactly at quote -> inclusive
    (3L, "A", ts("2024-01-01 11:30:00")), // between -> 10:00 quote
    (4L, "A", ts("2024-01-01 13:00:00")), // after both -> 12:00 quote
    (5L, "B", ts("2024-01-01 12:00:00")), // B's key isolated from A's
    (6L, "C", ts("2024-01-01 12:00:00"))) // key with no quotes -> null
    .toDF("id", "k", "ets")

  test("asOfJoin attaches latest earlier-or-equal right row per key") {
    val out = AsOf.asOfJoin(events, quotes, Seq("k"), "ets", "qts")
      .select($"id", $"rate")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(out === Map(
      1L -> None, 2L -> Some(1.0), 3L -> Some(1.0),
      4L -> Some(2.0), 5L -> Some(9.0), 6L -> None))
  }

  test("asOfJoin agrees with the brute-force max-filter join") {
    val brute = events.as("e")
      .join(quotes.as("q"), $"e.k" === $"q.k" && $"e.ets" >= $"q.qts", "left")
      .groupBy($"e.id")
      .agg(org.apache.spark.sql.functions.max_by($"q.rate", $"q.qts").as("rate"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    val got = AsOf.asOfJoin(events, quotes, Seq("k"), "ets", "qts")
      .select($"id", $"rate")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(got === brute)
  }

  test("asOfJoin keeps all left rows and columns") {
    val out = AsOf.asOfJoin(events, quotes, Seq("k"), "ets", "qts")
    assert(out.count() === events.count())
    assert(out.columns.toSet === Set("k", "ets", "id", "rate"))
  }

  test("epoch-bucketed as-of == plain as-of on the crafted cases") {
    val plain = AsOf.asOfJoin(events, quotes, Seq("k"), "ets", "qts")
      .select($"id", $"rate")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    // epoch = 30 min: lookbacks cross epoch boundaries (event 4 at
    // 13:00 reaches the 12:00 quote two epochs back)
    val bucketed = AsOf.asOfJoinEpochBucketed(
      events, quotes, Seq("k"), "ets", "qts", epochSeconds = 1800L)
      .select($"id", $"rate")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(bucketed === plain)
  }

  test("epoch-bucketed as-of == plain as-of on randomized timelines") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      nQ <- Gen.choose(0, 25)
      nE <- Gen.choose(1, 60)
      // distinct quote seconds per key (rightTs uniqueness contract)
      qts <- Gen.pick(nQ, 0 until 5000)
      es <- Gen.listOfN(nE, Gen.choose(0, 5000))
    } yield (qts.toList, es)
    (1 to 8).foreach { i =>
      val (qSecs, eSecs) = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val base = 1700000000L // fixed epoch base
      val q = qSecs.zipWithIndex.map { case (s, j) =>
        ("k", new Timestamp((base + s) * 1000L), j.toDouble)
      }.toDF("k", "qts", "rate")
      val e = eSecs.zipWithIndex.map { case (s, j) =>
        (j.toLong, "k", new Timestamp((base + s) * 1000L))
      }.toDF("id", "k", "ets")
      val plain = AsOf.asOfJoin(e, q, Seq("k"), "ets", "qts")
        .select($"id", $"rate")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
      val bucketed = AsOf.asOfJoinEpochBucketed(
        e, q, Seq("k"), "ets", "qts", epochSeconds = 600L)
        .select($"id", $"rate")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
      assert(bucketed === plain, s"seed $i")
    }
  }

  test("column collision between sides is rejected") {
    val bad = quotes.withColumnRenamed("rate", "id")
    val e = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(events, bad, Seq("k"), "ets", "qts")
    }
    assert(e.getMessage.contains("collision"))
  }
}
