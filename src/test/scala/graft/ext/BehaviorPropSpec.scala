package graft.ext

import java.sql.Timestamp
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property checks for the behavioral operators: the distributed
  * window/aggregate pipelines must agree with straight-line Scala
  * references on random event streams (simultaneous timestamps, short
  * histories, missing touch types — the edge cases hand tests miss).
  */
class BehaviorPropSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val types = List("view", "click", "purchase", "error")
  // (id, user, type, tsMillis) with heavy ts collisions
  private val eventsGen: Gen[List[(Long, Long, String, Long)]] =
    Gen.listOfN(60, for {
      u <- Gen.chooseNum(1L, 6L)
      t <- Gen.oneOf(types)
      ts <- Gen.chooseNum(0L, 20L)
    } yield (u, t, ts * 60000L)).map(_.zipWithIndex.map {
      case ((u, t, ts), i) => (i.toLong, u, t, ts)
    })

  private def toDf(rows: List[(Long, Long, String, Long)]) =
    rows.map { case (id, u, t, ts) => (id, u, t, new Timestamp(ts), 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")

  test("lastTouchAttribution equals the straight-line reference") {
    forAllSeeded(eventsGen, 6) { rows =>
      val got = Behavior.lastTouchAttribution(
        toDf(rows), "event_id", "user_id", "event_type", "ts", "value",
        "purchase", Seq("click", "view"), windowDays = 7)
        .select("event_id", "channel").as[(Long, String)].collect().toMap
      val want = rows.filter(_._3 == "purchase").map { case (id, u, _, ts) =>
        val touch = rows
          .filter(r => r._2 == u && Set("click", "view")(r._3))
          .filter(r => r._4 < ts || (r._4 == ts && r._1 < id)) // strictly precedes in (ts, id)
          .sortBy(r => (r._4, r._1)).lastOption
        // 7-day window never binds here (20-min span) — touch wins if any
        id -> touch.map(_._3).getOrElse("direct")
      }.toMap
      assert(got === want, s"rows: $rows")
    }
  }

  test("topPaths equals the straight-line reference") {
    forAllSeeded(eventsGen, 6) { rows =>
      val got = Behavior.topPaths(
        toDf(rows), "user_id", "event_type", "ts", "event_id",
        depth = 3, k = 100)
        .as[(String, Long)].collect().toMap
      val want = rows.groupBy(_._2).values
        .map(_.sortBy(r => (r._4, r._1)).take(3).map(_._3).mkString(" > "))
        .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      assert(got === want, s"rows: $rows")
    }
  }

  test("gini equals the direct formula on random values") {
    val valGen = Gen.listOfN(40, Gen.chooseNum(0, 1000))
    forAllSeeded(valGen, 6) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v / 4.0) }
        .toDF("id", "v")
      val got = graft.ext.Analytics.gini(df, "v", "id")
        .select("gini").as[Double].head()
      val sorted = vs.map(_ / 4.0).sorted
      val n = sorted.size
      val s = sorted.sum
      val ws = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val want = if (s == 0.0) Double.NaN
        else 2.0 * ws / (n * s) - (n + 1.0) / n
      if (!want.isNaN)
        assert(math.abs(got - want) < 1e-4, s"got $got want $want vs: $vs")
    }
  }
}
