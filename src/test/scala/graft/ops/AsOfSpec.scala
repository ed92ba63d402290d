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

  test("column collision between sides is rejected") {
    val bad = quotes.withColumnRenamed("rate", "id")
    val e = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(events, bad, Seq("k"), "ets", "qts")
    }
    assert(e.getMessage.contains("collision"))
  }
}
