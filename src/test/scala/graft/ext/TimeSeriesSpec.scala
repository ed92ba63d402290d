package graft.ext

import java.sql.Timestamp
import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFillHourlyCounts zero-fills every (key, hour) cell of the global spine") {
    val ev = Seq(
      ("a", ts("2024-01-01 00:10:00")),
      ("a", ts("2024-01-01 00:50:00")),
      ("a", ts("2024-01-01 03:00:00")), // hours 1,2 are gaps for a
      ("b", ts("2024-01-01 01:30:00"))  // b missing hours 0,2,3
    ).toDF("event_type", "ts")
    val out = TimeSeries.gapFillHourlyCounts(ev, "event_type", "ts")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2)))
      .toSet
    assert(out == Set(
      ("a", "2024-01-01 00:00:00.0", 2L),
      ("a", "2024-01-01 01:00:00.0", 0L),
      ("a", "2024-01-01 02:00:00.0", 0L),
      ("a", "2024-01-01 03:00:00.0", 1L),
      ("b", "2024-01-01 00:00:00.0", 0L),
      ("b", "2024-01-01 01:00:00.0", 1L),
      ("b", "2024-01-01 02:00:00.0", 0L),
      ("b", "2024-01-01 03:00:00.0", 0L)))
  }

  test("rollingHourlyAverage trailing frame is exact over the dense series") {
    val ev = Seq(
      ("a", ts("2024-01-01 00:00:00")),
      ("a", ts("2024-01-01 00:30:00")),
      ("a", ts("2024-01-01 02:00:00"))
    ).toDF("event_type", "ts")
    // dense cnts: h0=2, h1=0, h2=1; frame=2 -> avgs: 2.0, 1.0, 0.5
    val out = TimeSeries.rollingHourlyAverage(ev, "event_type", "ts", frameHours = 2)
      .orderBy("hr").select("avg_frame").as[Double].collect().toSeq
    assert(out == Seq(2.0, 1.0, 0.5))
  }

  test("the hour spine is broadcast — the dense join never shuffles the spine side") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val plan = TimeSeries.gapFillHourlyCounts(ev, "event_type", "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"spine join not broadcast:\n$plan")
  }

  test("slidingCorrelation finds the perfect match and anti-match windows") {
    // windows of length 4 over t=0..11; [10,20,30,40] at t=2 is a
    // perfect ramp match, [40,30,20,10] at t=7 a perfect anti-match
    val vals = Seq(5.0, 5.0, 10.0, 20.0, 30.0, 40.0, 5.0,
      40.0, 30.0, 20.0, 10.0, 5.0)
    val series = vals.zipWithIndex.map { case (v, t) => (t.toLong, v) }
      .toDF("t", "v")
    val out = TimeSeries.slidingCorrelation(
        series, "t", "v", Seq(1.0, 2.0, 3.0, 4.0), k = 12)
      .as[(Long, Double)].collect()
    assert(out.head == ((2L, 1.0)))
    assert(out.last == ((7L, -1.0)))
    // edge windows with fewer than |query| points are dropped:
    // valid starts are exactly 0..8
    assert(out.map(_._1).toSet == (0L to 8L).toSet)
  }

  test("rollingAnomalies flags a spike against the trailing baseline only") {
    // key "a": 10 calm hours of ~2 events, then a 40-event storm hour
    val calm = (0 until 10).flatMap(h => Seq.fill(2 + h % 2)(
      ("a", s"2024-01-01 ${"%02d".format(h)}:15:00")))
    val storm = Seq.fill(40)(("a", "2024-01-01 10:30:00"))
    val df = (calm ++ storm).toDF("k", "s")
      .withColumn("ts", $"s".cast("timestamp")).drop("s")
    val out = TimeSeries.rollingAnomalies(df, "k", "ts",
      frameHours = 24, threshold = 3.0)
      .select($"hr".cast("string"), $"cnt", $"z")
      .as[(String, Long, Double)].collect()
    assert(out.length === 1)
    assert(out.head._1 === "2024-01-01 10:00:00" && out.head._2 === 40L)
    assert(out.head._3 > 3.0)
  }

  test("rollingAnomalies: warm-up and zero-variance hours never flag") {
    // constant series: every baseline has zero variance -> no flags
    val df = (0 until 8).map(h => ("a", s"2024-01-01 ${"%02d".format(h)}:00:00"))
      .toDF("k", "s").withColumn("ts", $"s".cast("timestamp")).drop("s")
    assert(TimeSeries.rollingAnomalies(df, "k", "ts", 24, 1.0).count() === 0L)
  }

  test("slidingCorrelation ranks by (corr desc, start) deterministically") {
    // constant-multiple windows tie at corr 1.0; earlier start wins
    val vals = Seq(1.0, 2.0, 1.0, 2.0, 1.0, 2.0)
    val series = vals.zipWithIndex.map { case (v, t) => (t.toLong, v) }
      .toDF("t", "v")
    val out = TimeSeries.slidingCorrelation(
        series, "t", "v", Seq(1.0, 2.0), k = 3)
      .as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(0L, 2L, 4L))
    assert(out.forall(_._2 == 1.0))
  }

  test("autocorrelation matches the hand-computed closed form on a dense series") {
    // x = [1,2,1,2,1,2]: n=6, S=9, Sxx=15.
    // lag1: C=10, A=8, B=7, m=5 -> num=36*10-54*15+5*81=-45, den=54
    //   r1 = -45/54 = -0.8333... -> floor-quantized -0.833334
    // lag2: C=10, A=B=6, m=4 -> num=360-648+324=36 -> r2=0.666666
    val series = Seq(1.0, 2.0, 1.0, 2.0, 1.0, 2.0).zipWithIndex
      .map { case (v, t) => (t.toLong, v) }.toDF("t", "x")
    val out = TimeSeries.autocorrelation(series, "t", "x", maxLag = 2)
      .orderBy("lag").as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 5L, -0.833334), (2L, 4L, 0.666666)))
  }

  test("autocorrelation tolerates gaps: only co-present (t, t-lag) pairs correlate") {
    // t=3 missing: lag-1 overlap loses BOTH (3,2) and (4,3)
    val series = Seq(0L -> 1.0, 1L -> 2.0, 2L -> 1.0, 4L -> 1.0, 5L -> 2.0)
      .toDF("t", "x")
    val out = TimeSeries.autocorrelation(series, "t", "x", maxLag = 1)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(_._2) == Seq(3L)) // (1,0), (2,1), (5,4)
  }

  test("autocorrelation yields null on a zero-variance series and empty lags") {
    val series = Seq(0L -> 5.0, 1L -> 5.0, 2L -> 5.0).toDF("t", "x")
    val out = TimeSeries.autocorrelation(series, "t", "x", maxLag = 4)
      .orderBy("lag").collect()
    assert(out.length == 4)
    assert(out.forall(_.isNullAt(2)))      // den == 0 -> null acf
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 1L, 0L, 0L))
  }

  test("changepoint finds a planted level shift with the exact statistic") {
    // 10,10,10,10,30,30,30,30: split after i=4 -> C = 320/sqrt(128)
    val series = (Seq.fill(4)(10L) ++ Seq.fill(4)(30L)).zipWithIndex
      .map { case (v, t) => (t.toLong, v) }.toDF("t", "x")
    val out = TimeSeries.changepoint(series, "t", "x").collect().head
    assert(out.getLong(0) == 3L && out.getLong(1) == 4L && out.getLong(2) == 4L)
    assert(out.getDouble(3) == 10.0 && out.getDouble(4) == 30.0)
    assert(out.getDouble(5) == math.floor(320.0 / math.sqrt(128.0) * 1e6) / 1e6)
  }

  test("changepoint ties break on the earliest split index") {
    val series = (0L until 6L).map(t => (t, 7L)).toDF("t", "x")
    val out = TimeSeries.changepoint(series, "t", "x").collect().head
    assert(out.getLong(0) == 0L)            // all stats 0 -> earliest t
    assert(out.getDouble(5) == 0.0)
  }

  test("autocorrelation lag alignment is a join, not a single-partition window") {
    val series = (0L until 50L).map(t => (t, (t % 7).toDouble)).toDF("t", "x")
    val plan = TimeSeries.autocorrelation(series, "t", "x", 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), s"unexpected window:\n$plan")
  }

  test("seasonalNaiveBacktest scores a perfect weekly cycle as mase 0") {
    // x_t = t mod 7 for t = 0..20: seasonal-naive error is exactly 0;
    // the naive (lag-1) error is 1 within a cycle and 6 at each wrap.
    val series = (0L to 20L).map(t => ("e", t, (t % 7).toDouble))
      .toDF("k", "t", "x")
    val out = TimeSeries.seasonalNaiveBacktest(series, Seq("k"), "t", "x", 7)
      .collect().head
    assert(out.getLong(1) == 14L)                 // t = 7..20
    assert(out.getDouble(2) == 0.0)               // mae
    assert(out.getLong(3) == 20L)                 // t = 1..20
    // naive mae = (18·1 + 2·6)/20 = 1.5
    assert(out.getDouble(4) == 1.5)
    assert(out.getDouble(5) == 0.0)               // mase
  }

  test("seasonalNaiveBacktest averages only the pairs that exist") {
    val series = Seq(("e", 0L, 5.0), ("e", 1L, 9.0), ("e", 7L, 8.0),
      ("e", 9L, 4.0)).toDF("k", "t", "x")
    val out = TimeSeries.seasonalNaiveBacktest(series, Seq("k"), "t", "x", 7)
      .collect().head
    // seasonal pairs: only (7,0) → |8−5| = 3; naive pairs: only (1,0)
    assert(out.getLong(1) == 1L && out.getDouble(2) == 3.0)
    assert(out.getLong(3) == 1L && out.getDouble(4) == 4.0)
    assert(out.getDouble(5) == 0.75)
  }

  test("crossCorrelation peaks at the planted lead-lag offset, exactly") {
    // x_t = t mod 4 (5 full cycles), y_t = (t−2) mod 4: y lags x by 2,
    // so y_{t−k} = x_t at k = −2. Same value multiset on both sides →
    // x̄ = ȳ = 1.5, full var = 25; the 18 overlap pairs contribute
    // num = 25 − ((0.5)² + (1.5)²) = 22.5 → ccf(−2) = 22.5/25 = 0.9.
    val x = (0L to 19L).map(t => (t, (t % 4).toDouble)).toDF("t", "v")
    val y = (0L to 19L).map(t => (t, ((t + 2) % 4).toDouble)).toDF("t", "v")
    val out = TimeSeries.crossCorrelation(x, y, "t", "v", maxLag = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out(-2L)._1 == 18L)
    assert(out(-2L)._2.contains(0.9))
    assert(out.keySet == (-3L to 3L).toSet)
    // lag 0 pairs values offset by 2 in the cycle — anticorrelated
    assert(out(0L)._2.exists(_ < 0))
  }

  test("crossCorrelation reports empty-overlap lags as 0 pairs, null ccf") {
    val x = (10L to 13L).map(t => (t, t.toDouble)).toDF("t", "v")
    val y = (0L to 3L).map(t => (t, t.toDouble)).toDF("t", "v")
    val out = TimeSeries.crossCorrelation(x, y, "t", "v", maxLag = 2)
      .collect()
    assert(out.length == 5)
    assert(out.forall(r => r.getLong(1) == 0L && r.isNullAt(2)))
  }

  test("seasonalNaiveBacktest keeps keys separate and windows out of the plan") {
    val series = (0L to 13L).flatMap(t =>
      Seq(("a", t, (t % 7).toDouble), ("b", t, t.toDouble)))
      .toDF("k", "t", "x")
    val df = TimeSeries.seasonalNaiveBacktest(series, Seq("k"), "t", "x", 7)
    val byKey = df.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(byKey("a") == 0.0)
    assert(byKey("b") == 7.0)   // |t − (t−7)| = 7 everywhere
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), s"unexpected window:\n$plan")
  }

  test("seasonalDecompose recovers a pure weekly pattern exactly") {
    // 21 days from Mon 2024-01-01; value 10, +7 bump on Tuesdays.
    // Centered 7-day MA = (6*10+17)/7 = 11 exactly on full windows;
    // detrended = +6 (Tue) / -1 (else); indices already sum to 0.
    val rows = (0 until 21).map { i =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)
      val v = if (d.getDayOfWeek.getValue == 2) 17.0 else 10.0
      ("k", Timestamp.valueOf(d.atTime(12, 0)), v)
    }
    val out = TimeSeries.seasonalDecompose(
      rows.toDF("k", "ts", "v"), "k", "ts", "v").collect()
    assert(out.length === 21)
    val full = out.filter(!_.isNullAt(4)) // trend defined
    assert(full.length === 15)            // 3-day edges null on each end
    assert(full.forall(_.getDouble(4) === 11.0))
    // seasonal: +6 on Tuesday (dow=3, Sunday=1), -1 otherwise; resid 0
    assert(full.forall { r =>
      val want = if (r.getInt(2) === 3) 6.0 else -1.0
      r.getDouble(5) === want && r.getDouble(6) === 0.0
    })
    // edge rows still get their dow's seasonal index
    val edges = out.filter(_.isNullAt(4))
    assert(edges.forall(r => !r.isNullAt(5) && r.isNullAt(6)))
  }
}
