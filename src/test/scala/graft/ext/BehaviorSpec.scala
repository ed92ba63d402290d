package graft.ext

import java.sql.Timestamp
import graft.SparkSpec

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("retentionWeekly cohorts by first-event week with exact offsets") {
    val ev = Seq(
      // u1: first event Tue 2024-01-02 (cohort Mon 01-01), active wk0 + wk2
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-16 10:00:00")),
      // u2: same cohort week, only wk0
      (2L, ts("2024-01-07 23:00:00")),
      // u3: cohort Mon 01-15
      (3L, ts("2024-01-15 00:00:00"))
    ).toDF("user_id", "ts")
    val out = Behavior.retentionWeekly(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .toSet
    assert(out == Set(
      ("2024-01-01", 0L, 2L),
      ("2024-01-01", 2L, 1L),
      ("2024-01-15", 0L, 1L)))
  }

  test("retentionWeekly plans one shuffle: window + aggregate, no join") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val plan = Behavior.retentionWeekly(ev, "user_id", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      "cohort assignment must reuse the user partitioning, not join back")
  }

  test("funnel enforces strict event ordering per user") {
    val ev = Seq(
      // u1 converts fully in order
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 01:00:00")),
      (1L, "purchase", ts("2024-01-01 02:00:00")),
      // u2: purchase BEFORE click — must not count as stage 3
      (2L, "view", ts("2024-01-01 00:00:00")),
      (2L, "purchase", ts("2024-01-01 00:30:00")),
      (2L, "click", ts("2024-01-01 01:00:00")),
      // u3: click only — no view, not even stage 1
      (3L, "click", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Behavior.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((1L, "view", 2L), (2L, "click", 2L), (3L, "purchase", 1L)))
  }

  test("funnel equals the SQL sequential-min oracle on real data") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    ev.createOrReplaceTempView("ev_funnel")
    val got = Behavior.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val want = spark.sql(
      """WITH s0 AS (SELECT user_id, MIN(ts) t0 FROM ev_funnel WHERE event_type='view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, MIN(e.ts) t1 FROM ev_funnel e JOIN s0 USING (user_id)
        |       WHERE e.event_type='click' AND e.ts > s0.t0 GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) t2 FROM ev_funnel e JOIN s1 USING (user_id)
        |       WHERE e.event_type='purchase' AND e.ts > s1.t1 GROUP BY 1)
        |SELECT (SELECT COUNT(*) FROM s0) v, (SELECT COUNT(*) FROM s1) c,
        |       (SELECT COUNT(*) FROM s2) p""".stripMargin).head
    assert(got("view") == want.getLong(0))
    assert(got("click") == want.getLong(1))
    assert(got("purchase") == want.getLong(2))
  }

  test("rfm: quintile scores with 5 = best on every dimension") {
    // 5 customers, one order each, strictly increasing on all dims
    val df = (1 to 5).map { i =>
      (i.toLong, s"2024-01-0$i 00:00:00", i * 100.0)
    }.toDF("cust", "s", "amount")
      .withColumn("ts", $"s".cast("timestamp")).drop("s")
    val out = Behavior.rfm(df, "cust", "ts", "amount", "2024-02-01")
      .select("cust", "r_score", "f_score", "m_score", "segment")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // cust 5: most recent, highest spend -> r=5, m=5 (f ties -> id asc)
    assert(out(5L)._2 === 5L && out(5L)._4 === 5L)
    assert(out(1L)._2 === 1L && out(1L)._4 === 1L)
    assert(out(1L)._5.length === 3)
    // frequency all equal: tie-break by id gives each its own tile
    assert(out.values.map(_._3).toSet === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("topPaths: ordered prefixes, short journeys, deterministic ties") {
    val df = Seq(
      (1L, 10L, "view", "2024-01-01 10:00:00"),
      (2L, 10L, "click", "2024-01-01 10:01:00"),
      (3L, 10L, "purchase", "2024-01-01 10:02:00"),
      (4L, 10L, "error", "2024-01-01 10:03:00"), // beyond depth: ignored
      (5L, 20L, "view", "2024-01-01 09:00:00"),
      (6L, 20L, "click", "2024-01-01 09:01:00"),
      (7L, 20L, "purchase", "2024-01-01 09:02:00"),
      (8L, 30L, "signup", "2024-01-01 08:00:00")) // 1-step journey
      .toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", $"s".cast("timestamp")).drop("s")
    val out = Behavior.topPaths(df, "user_id", "event_type", "ts",
      "event_id", depth = 3, k = 10)
      .as[(String, Long)].collect().toList
    assert(out === List(("view > click > purchase", 2L), ("signup", 1L)))
  }

  test("topPaths plans the prefix prune as a WindowGroupLimit") {
    val df = (1 to 40).map(i => (i.toLong, (i % 5).toLong, "view",
      new java.sql.Timestamp(i * 1000L)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val plan = Behavior.topPaths(df, "user_id", "event_type", "ts",
      "event_id", 3, 10).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("conversionZTest: exact counts, pooled z, predicate conversions") {
    // A: 2 of 3 users convert; B: 1 of 3 (conversion = value >= 50)
    val df = Seq(
      ("A", 1L, 60.0), ("A", 1L, 10.0), ("A", 2L, 70.0), ("A", 3L, 5.0),
      ("B", 4L, 55.0), ("B", 5L, 8.0), ("B", 6L, 9.0))
      .toDF("variant", "user_id", "value")
    val out = Behavior.conversionZTest(df, "user_id", "variant",
      $"value" >= 50.0)
      .as[(String, Long, Long, String, Long, Long, Double, Double, Double)]
      .head()
    assert(out._1 === "A" && out._2 === 3L && out._3 === 2L)
    assert(out._4 === "B" && out._5 === 3L && out._6 === 1L)
    val (ra, rb, p) = (2.0 / 3, 1.0 / 3, 3.0 / 6)
    val z = (ra - rb) / math.sqrt(p * (1 - p) * (1.0 / 3 + 1.0 / 3))
    assert(math.abs(out._7 - 0.666667) < 1e-6)
    assert(math.abs(out._9 - z) < 1e-5)
  }

  test("cohortLtv: acquisition-week cohorts, revenue by age") {
    val df = Seq(
      // user 1: first seen Mon Jan 1 week (signup), buys week 0 and week 1
      (1L, "signup", "2024-01-01 10:00:00", 0.0),
      (1L, "purchase", "2024-01-03 10:00:00", 10.0),
      (1L, "purchase", "2024-01-10 10:00:00", 20.0),
      // user 2: same cohort, buys week 0 twice
      (2L, "purchase", "2024-01-02 09:00:00", 5.0),
      (2L, "purchase", "2024-01-04 09:00:00", 7.0),
      // user 3: next week's cohort
      (3L, "purchase", "2024-01-08 12:00:00", 100.0))
      .toDF("user_id", "event_type", "s", "value")
      .withColumn("ts", $"s".cast("timestamp")).drop("s")
    val out = Behavior.cohortLtv(df, "user_id", "event_type", "ts",
      "value", "purchase")
      .select($"cohort_week".cast("string"), $"week_offset", $"revenue", $"n_buyers")
      .as[(String, Long, Double, Long)].collect().toSet
    assert(out === Set(
      ("2024-01-01", 0L, 22.0, 2L), // 10 + 5 + 7, buyers 1 and 2
      ("2024-01-01", 1L, 20.0, 1L),
      ("2024-01-08", 0L, 100.0, 1L)))
  }

  test("cumulativeDistinctUsers: first-seen day counts and running total") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-03 10:00:00"),
      (2L, "2024-01-01 12:00:00"), (3L, "2024-01-02 09:00:00"),
      (3L, "2024-01-01 23:59:59")) // user 3's first day is Jan 1
      .toDF("user_id", "s").withColumn("ts", $"s".cast("timestamp"))
    val out = Behavior.cumulativeDistinctUsers(df, "user_id", "ts")
      .orderBy("day")
      .select($"day".cast("string"), $"n_new_users", $"n_cumulative_users")
      .as[(String, Long, Long)].collect().toList
    // Jan 1: users 1,2,3 all first seen; Jan 2/3 add nobody new
    assert(out === List(("2024-01-01", 3L, 3L)))
  }

  test("cumulativeDistinctUsers accumulates across days") {
    val df = Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-02"),
      (1L, "2024-01-03"), (4L, "2024-01-04"))
      .toDF("user_id", "s").withColumn("ts", $"s".cast("timestamp"))
    val out = Behavior.cumulativeDistinctUsers(df, "user_id", "ts")
      .orderBy("day").select("n_new_users", "n_cumulative_users")
      .as[(Long, Long)].collect().toList
    assert(out === List((1L, 1L), (2L, 3L), (1L, 4L)))
  }

  test("lastTouchAttribution credits latest preceding touch inside window") {
    val df = Seq(
      (1L, 10L, "click", "2024-01-01 10:00:00", 0.0),
      (2L, 10L, "view", "2024-01-01 11:00:00", 0.0),
      (3L, 10L, "purchase", "2024-01-01 12:00:00", 99.0), // → view (latest)
      (4L, 10L, "purchase", "2024-01-10 12:00:00", 50.0), // 9 days later → direct
      (5L, 20L, "purchase", "2024-01-01 08:00:00", 10.0)) // no touch → direct
      .toDF("event_id", "user_id", "event_type", "s", "value")
      .withColumn("ts", $"s".cast("timestamp")).drop("s")
    val out = Behavior.lastTouchAttribution(df, "event_id", "user_id",
      "event_type", "ts", "value", "purchase", Seq("click", "view"), 7)
      .select("event_id", "channel").as[(Long, String)].collect().toMap
    assert(out === Map(3L -> "view", 4L -> "direct", 5L -> "direct"))
  }

  test("lastTouchAttribution: same-instant touch is not credited; id breaks ts ties") {
    val df = Seq(
      (1L, 1L, "click", "2024-01-01 10:00:00", 0.0),
      (2L, 1L, "purchase", "2024-01-01 10:00:00", 5.0)) // same ts, click id < purchase id
      .toDF("event_id", "user_id", "event_type", "s", "value")
      .withColumn("ts", $"s".cast("timestamp")).drop("s")
    val out = Behavior.lastTouchAttribution(df, "event_id", "user_id",
      "event_type", "ts", "value", "purchase", Seq("click"), 7)
      .select("channel").as[String].head()
    // click sorts before the purchase (same ts, smaller id) -> credited
    assert(out === "click")
  }

  test("cupedAdjustedMeans matches the hand-computed pooled-theta form") {
    import org.apache.spark.sql.functions.col
    // (user, variant, value, pre): x = [10,20,30,40], y = [20,40,50,80]
    // θ = (4·5700 − 100·190)/(4·3000 − 100²) = 1.9, pooled x̄ = 25.
    // A: post-mean 30, pre-mean 15 → 30 − 1.9·(−10) = 49
    // B: post-mean 65, pre-mean 35 → 65 − 1.9·(+10) = 46
    val ev = Seq(
      (1L, "A", 10.0, 1), (1L, "A", 20.0, 0),
      (2L, "A", 20.0, 1), (2L, "A", 40.0, 0),
      (3L, "B", 30.0, 1), (3L, "B", 50.0, 0),
      (4L, "B", 40.0, 1), (4L, "B", 80.0, 0)
    ).toDF("user_id", "variant", "value", "pre")
    val out = Behavior.cupedAdjustedMeans(
        ev, "user_id", "variant", "value", col("pre") === 1)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out("A") == ((2L, 30.0, 49.0)))
    assert(out("B") == ((2L, 65.0, 46.0)))
  }

  test("cupedAdjustedMeans sums multiple events per period and nulls " +
    "the adjustment when var(pre) is 0") {
    import org.apache.spark.sql.functions.col
    // u1 has two pre events (3+7=10) — per-user sums, not row means.
    val ev = Seq(
      (1L, "A", 3.0, 1), (1L, "A", 7.0, 1), (1L, "A", 20.0, 0),
      (2L, "B", 10.0, 1), (2L, "B", 30.0, 0))
      .toDF("user_id", "variant", "value", "pre")
    val adj = Behavior.cupedAdjustedMeans(
        ev, "user_id", "variant", "value", col("pre") === 1)
      .select("mean_adjusted").as[Option[Double]].collect()
    // var(x) = 0 (both users' pre = 10) → adjustment undefined.
    assert(adj.forall(_.isEmpty))
  }

  test("liftTable: per-tile and cumulative lift from exact counts") {
    import org.apache.spark.sql.functions.col
    // Scores 1..20 unique; positives = the top 4 scores + score 1.
    // 5 buckets of 4: rates 1.0/0/0/0/0.25, base rate 0.25.
    val df = (1 to 20).map(i =>
      (i.toLong, i.toDouble, i >= 17 || i == 1)).toDF("id", "s", "pos")
    val out = Behavior.liftTable(df, "s", "id", col("pos"), buckets = 5)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out(1L) == ((4L, 4L, 1.0, 4.0, 4.0)))
    assert(out(2L) == ((4L, 0L, 0.0, 0.0, 2.0)))
    assert(out(5L) == ((4L, 1L, 0.25, 1.0, 1.0)))
  }

  test("liftTable breaks score ties on the id column") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 5.0, true), (2L, 5.0, true), (3L, 5.0, false),
      (4L, 5.0, false)).toDF("id", "s", "pos")
    val out = Behavior.liftTable(df, "s", "id", col("pos"), buckets = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out == Map(1L -> 1.0, 2L -> 0.0))
  }

  test("cupedAdjustedMeans is partition-invariant") {
    import org.apache.spark.sql.functions.col
    val ev = (1 to 200).map { i =>
      (i.toLong % 40, if (i % 2 == 0) "A" else "B",
        (i * 13 % 101).toDouble, i % 3)
    }.toDF("user_id", "variant", "value", "pre")
    def run(p: Int) = Behavior.cupedAdjustedMeans(
        ev.repartition(p), "user_id", "variant", "value", col("pre") === 0)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(run(1) == run(17))
  }

  test("welchTTest: matches the closed-form scalar model on unequal " +
    "variances and picks the two lowest variants") {
    val a = Seq(10.0, 12.0, 11.0, 13.0, 9.0)        // tight
    val b = Seq(5.0, 25.0, 1.0, 30.0, 14.0, 2.0)    // wide
    val rows = a.map(("alpha", _)) ++ b.map(("beta", _)) ++
      Seq(("zeta", 99.0)) // third variant must be ignored
    val out = Behavior.welchTTest(
      rows.toDF("variant", "value"), "variant", "value")
      .as[(String, String, Long, Long, Double, Double, Double, Double)]
      .head()
    def stats(xs: Seq[Double]) = {
      val n = xs.length
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n, m, v)
    }
    val (na, ma, va) = stats(a)
    val (nb, mb, vb) = stats(b)
    val se2 = va / na + vb / nb
    val t = (ma - mb) / math.sqrt(se2)
    val df = se2 * se2 /
      (math.pow(va / na, 2) / (na - 1) + math.pow(vb / nb, 2) / (nb - 1))
    assert(out._1 === "alpha" && out._2 === "beta")
    assert(out._3 === na.toLong && out._4 === nb.toLong)
    assert(math.abs(out._5 - ma) < 1e-6)
    assert(math.abs(out._7 - t) < 1e-5, s"t ${out._7} vs $t")
    assert(math.abs(out._8 - df) < 1e-4, s"df ${out._8} vs $df")
    // Welch df must sit strictly below the pooled n-2 when variances
    // differ (the whole reason to use it)
    assert(out._8 < (na + nb - 2).toDouble)
  }

  test("kaplanMeier: textbook curve with censoring and a terminal " +
    "n=d zero, partition-invariant") {
    val subj = Seq(
      (1L, true), (2L, true), (2L, false), (3L, true),
      (4L, false), (5L, true))
      .toDF("duration", "observed")
    val out = Behavior.kaplanMeier(subj, "duration", "observed")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // (duration, n_risk, n_events, n_censored, survival)
    assert(out(1L)._2 === 6L && out(1L)._3 === 1L)
    assert(math.abs(out(1L)._5 - 5.0 / 6.0) < 1e-9)
    assert(out(2L)._2 === 5L && out(2L)._3 === 1L && out(2L)._4 === 1L)
    assert(math.abs(out(2L)._5 - 2.0 / 3.0) < 1e-9)
    assert(out(3L)._2 === 3L)
    assert(math.abs(out(3L)._5 - 4.0 / 9.0) < 1e-9)
    // censoring-only duration leaves the curve flat
    assert(out(4L)._3 === 0L && out(4L)._5 === out(3L)._5)
    // last subject dies: n_risk = n_events -> survival exactly 0
    assert(out(5L)._2 === 1L && out(5L)._5 === 0.0)
    val again = Behavior.kaplanMeier(
      subj.repartition(8), "duration", "observed")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(again === out)
  }
}
