package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Time-series regularization over the event stream: dense
  * gap-filled series and rolling-frame smoothing. No reference
  * equivalent (north-star extension per BASELINE.json).
  *
  * Scale notes (100 TB): the hour spine is `range / 3600 s` rows —
  * thousands, not billions — so spine × keys stays a broadcast; the
  * only full-data pass is the initial per-(key, hour) partial
  * aggregate. The rolling window then runs over the DENSE series
  * (|keys| × |hours| rows), not the raw events.
  */
object TimeSeries {

  /** Dense hourly counts per `keyCol`: every (key, hour) cell between
    * the global min and max event hour, zero-filled where no events
    * landed — the regularization every downstream window/forecast
    * step assumes.
    */
  def gapFillHourlyCounts(
      df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val counts = df
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val spine = counts
      .agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
      .select(explode(
        sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hr"))
    val keys = df.select(col(keyCol)).distinct()
    keys.crossJoin(broadcast(spine))
      .join(counts, Seq(keyCol, "hr"), "left")
      .select(col(keyCol), col("hr"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** [[gapFillHourlyCounts]] + a trailing `frameHours`-hour moving
    * average per key. The frame is ROWS-based over the dense series,
    * so it is exactly `frameHours` cells; count sums are integer-exact
    * and the single division is rounded for cross-engine compare.
    */
  def rollingHourlyAverage(
      df: DataFrame, keyCol: String, tsCol: String,
      frameHours: Int = 24): DataFrame = {
    require(frameHours >= 1, s"frame must be >= 1 hour: $frameHours")
    val dense = gapFillHourlyCounts(df, keyCol, tsCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hr"))
      .rowsBetween(-(frameHours - 1), Window.currentRow)
    // exact integer sum / exact integer count -> one float division
    dense.withColumn("avg_frame",
      round(sum(col("cnt")).over(w).cast("double") /
        count(lit(1)).over(w), 6))
  }

  /** Rolling anomaly detection on the dense hourly series: each hour's
    * count is z-scored against the TRAILING `frameHours` window
    * (excluding itself — an anomaly must not raise its own baseline),
    * and hours with |z| > `threshold` are flagged. The ops monitor for
    * traffic collapses and ingestion storms: "is this hour's volume
    * abnormal for this key, given ITS recent history?" — per-key
    * baselines where the global [[graft.ext.Analytics.zscoreOutliers]]
    * would wash out diurnal keys.
    *
    * Determinism: baseline moments are exact integer sums over the
    * dense frame (counts are integers; the frame is ROWS-based over
    * the gap-filled spine, so its width is exact); mean/std/z run in
    * double on those integers identically cross-engine; z is
    * decide-on-rounded (6 dp) before the threshold compare. Warm-up
    * rows (fewer than 2 trailing cells) and zero-variance baselines
    * yield null z and are never flagged.
    *
    * Scale shape: the per-key ordered window walks the DENSE spine —
    * bounded by key-count × hours-of-history, not by event volume;
    * everything upstream is the gap-fill's one aggregate + spine join.
    */
  def rollingAnomalies(
      df: DataFrame, keyCol: String, tsCol: String,
      frameHours: Int = 24, threshold: Double = 3.0): DataFrame = {
    require(frameHours >= 2, s"baseline needs >= 2 hours: $frameHours")
    val dense = gapFillHourlyCounts(df, keyCol, tsCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hr"))
      .rowsBetween(-frameHours, -1)
    dense
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s1", sum(col("cnt")).over(w))
      .withColumn("__s2", sum(col("cnt") * col("cnt")).over(w))
      .withColumn("__var",
        (col("__s2").cast("double") -
          col("__s1").cast("double") * col("__s1").cast("double") /
            col("__n").cast("double")) / (col("__n") - 1).cast("double"))
      .withColumn("z",
        when(col("__n") >= 2 && col("__var") > 0,
          round((col("cnt").cast("double") -
            col("__s1").cast("double") / col("__n").cast("double")) /
            sqrt(col("__var")), 6)))
      .filter(abs(col("z")) > threshold)
      .select(col(keyCol), col("hr"), col("cnt"),
        col("__n").cast("long").as("baseline_hours"), col("z"))
  }

  /** Sample autocorrelation of an evenly-indexed series at lags
    * `1..maxLag` — the "is yesterday predictive of today?" diagnostic
    * that decides window sizes for every rolling baseline above, and
    * the standard seasonality detector (a weekly cycle shows as an
    * ACF spike at lag 7).
    *
    * Input is an already-aggregated (t, x) series — integer time index
    * `tCol` (unique), numeric `vCol`. Missing indices are tolerated:
    * each lag correlates exactly the pairs (t, t−lag) that BOTH exist,
    * with the estimator's mean/variance still taken over the FULL
    * series (the standard gappy-ACF convention; `n_pairs` reports the
    * overlap so a caller can judge coverage).
    *
    * NOT a window function: lag-k alignment is a self-equi-join on
    * `t − k` after exploding each point to its `maxLag` lag keys — an
    * ordinary shuffle join that scales with |series| × maxLag and
    * never collapses to a single partition the way
    * `Window.orderBy(t).lag(k)` would on an unpartitioned series.
    *
    * Determinism (the [[graft.ext.Olap]] moment discipline): x is
    * quantized to DECIMAL(18,6); all moments (S, Σx², C_k = Σ x_t·x_{t−k},
    * overlap edge sums A_k, B_k) are exact decimal sums, cast to double
    * once; the closed form
    *
    *   r_k = (n²·C_k − n·S·(A_k+B_k) + m_k·S²) / (n·(n·Σx² − S²))
    *
    * (mean-cleared numerator with denominators multiplied out) runs in
    * double on those exact values — bit-identical in any IEEE engine —
    * and the result is floor-quantized (⌊r·10⁶⌋/10⁶, tie-free: both
    * engines floor the SAME double, unlike round() whose
    * implementations differ — see [[Drift.psi]]).
    *
    * Output: (lag, n_pairs, acf) for lag = 1..maxLag; acf is null when
    * the series variance is zero or a lag has no overlap.
    */
  def autocorrelation(
      series: DataFrame, tCol: String, vCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1: $maxLag")
    val x = series
      .filter(col(tCol).isNotNull && col(vCol).isNotNull)
      .select(col(tCol).cast("long").as("__t"),
        col(vCol).cast("decimal(18,6)").as("__x"))
    val tot = x.agg(
      count(lit(1)).as("n"),
      sum(col("__x")).cast("double").as("s"),
      sum(col("__x") * col("__x")).cast("double").as("sxx"))
    val lagged = x.select(
      col("__t"), col("__x"),
      explode(array((1 to maxLag).map(i => lit(i.toLong)): _*)).as("lag"))
      .withColumn("__tj", col("__t") - col("lag"))
    val pairs = lagged.join(
      x.select(col("__t").as("__tj"), col("__x").as("__xl")), Seq("__tj"))
    val byLag = pairs.groupBy(col("lag"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("__x") * col("__xl")).cast("double").as("c"),
        sum(col("__x")).cast("double").as("a"),
        sum(col("__xl")).cast("double").as("b"))
    // A lag whose overlap is empty never reaches the group-by; the
    // tiny 1..maxLag spine re-introduces it (n_pairs 0, null acf).
    val spine = x.sparkSession.range(1, maxLag + 1L)
      .select(col("id").as("lag"))
    val n = col("n").cast("double")
    val m = col("n_pairs").cast("double")
    val num = n * n * col("c") - n * col("s") * (col("a") + col("b")) +
      m * col("s") * col("s")
    val den = n * (n * col("sxx") - col("s") * col("s"))
    spine.join(byLag, Seq("lag"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("acf",
        when(den =!= 0.0, floor(num / den * lit(1e6)) / lit(1e6)))
      .select(col("lag"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("acf"))
  }

  /** Sample cross-correlation between two evenly-indexed series at
    * lags −maxLag..maxLag — the lead-lag diagnostic ("do clicks LEAD
    * purchases, and by how many days?"): a peak at positive lag k
    * means x at time t co-moves with y from k steps earlier.
    *
    *   r_k = Σ_t (x_t − x̄)(y_{t−k} − ȳ) / √(Σ(x−x̄)² · Σ(y−ȳ)²)
    *
    * with the [[autocorrelation]] gappy convention: each lag sums
    * exactly the (t, t−k) pairs where BOTH series have a point, while
    * means/variances are full-series (n_pairs reports overlap).
    *
    * Scale + determinism shape: identical to [[autocorrelation]] —
    * lag alignment is a self-equi-join after exploding x to its
    * 2·maxLag+1 lag keys (never an unpartitioned window); both
    * series quantize to DECIMAL(18,6); every moment (full-series S,
    * Σv²; per-lag C_k, A_k, B_k, m_k) is an exact DECIMAL sum cast to
    * double once; the mean-cleared numerator
    *
    *   C_k − ȳ·A_k − x̄·B_k + m_k·x̄·ȳ
    *
    * runs in double on exact values and r_k is floor-quantized to
    * 6 dp (round()-on-double is the cross-engine trap — [[Drift.psi]]).
    *
    * Output: (lag, n_pairs, ccf) for every lag; ccf null when either
    * series is constant or the lag has no overlap.
    */
  def crossCorrelation(
      a: DataFrame, b: DataFrame, tCol: String, vCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1: $maxLag")
    def clean(df: DataFrame) = df
      .filter(col(tCol).isNotNull && col(vCol).isNotNull)
      .select(col(tCol).cast("long").as("__t"),
        col(vCol).cast("decimal(18,6)").as("__v"))
    val x = clean(a)
    val y = clean(b)
    def moments(df: DataFrame, n: String, s: String, ss: String) =
      df.agg(
        count(lit(1)).as(n),
        sum(col("__v")).cast("double").as(s),
        sum(col("__v") * col("__v")).cast("double").as(ss))
    val mx = moments(x, "__nx", "__sx", "__sxx")
    val my = moments(y, "__ny", "__sy", "__syy")
    val lagged = x.select(
      col("__t"), col("__v").as("__xv"),
      explode(array((-maxLag to maxLag).map(i => lit(i.toLong)): _*))
        .as("lag"))
      .withColumn("__tj", col("__t") - col("lag"))
    val pairs = lagged.join(
      y.select(col("__t").as("__tj"), col("__v").as("__yv")), Seq("__tj"))
    val byLag = pairs.groupBy(col("lag"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("__xv") * col("__yv")).cast("double").as("__c"),
        sum(col("__xv")).cast("double").as("__a"),
        sum(col("__yv")).cast("double").as("__b"))
    val spine = x.sparkSession.range(-maxLag.toLong, maxLag + 1L)
      .select(col("id").as("lag"))
    val xbar = col("__sx") / col("__nx").cast("double")
    val ybar = col("__sy") / col("__ny").cast("double")
    val num = col("__c") - ybar * col("__a") - xbar * col("__b") +
      col("n_pairs").cast("double") * xbar * ybar
    val varX = col("__sxx") - col("__sx") * col("__sx") /
      col("__nx").cast("double")
    val varY = col("__syy") - col("__sy") * col("__sy") /
      col("__ny").cast("double")
    spine.join(byLag, Seq("lag"), "left")
      .crossJoin(broadcast(mx)).crossJoin(broadcast(my))
      .select(col("lag"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        when(col("n_pairs") > 0 && varX > 0.0 && varY > 0.0,
          floor(num / sqrt(varX * varY) * lit(1e6)) / lit(1e6)).as("ccf"))
  }

  /** Seasonal-naïve forecast backtest: score the forecast
    * "x̂_t = x_{t−period}" against actuals, scaled by the in-sample
    * naïve (lag-1) error — the MASE discipline: a model (or a
    * monitoring threshold) is only worth deploying if it beats this
    * baseline, and `mase` < 1 here means the seasonal cycle is real
    * (seasonal-naïve beats naïve).
    *
    *   mae       = mean |x_t − x_{t−period}|
    *   naive_mae = mean |x_t − x_{t−1}|
    *   mase      = mae / naive_mae
    *
    * Input: an already-aggregated per-key series — integer index
    * `tCol` (unique per key), numeric `vCol`. Gaps are tolerated: each
    * score averages exactly the (t, t−lag) pairs that BOTH exist
    * (`n_pairs` / `n_naive` report coverage).
    *
    * Scale shape: lag alignment is a per-key self-equi-join on t−lag
    * (the [[autocorrelation]] shape — never `Window.orderBy(t).lag`,
    * which single-partitions an unkeyed series); the scores are
    * key-cardinality-bounded aggregates.
    *
    * Determinism: values quantize to DECIMAL(18,6); absolute-error
    * sums are exact DECIMAL; each mean is one IEEE division of exact
    * values and every reported ratio is floor-quantized to 6 dp
    * (round()-on-double diverges across engines — see [[Drift.psi]]).
    *
    * Output per key: (keys…, n_pairs, mae, n_naive, naive_mae, mase);
    * ratios are null when their denominator count (or `naive_mae` for
    * `mase`) is 0.
    */
  def seasonalNaiveBacktest(
      series: DataFrame, keyCols: Seq[String], tCol: String, vCol: String,
      period: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2 (lag-1 is the scale): $period")
    val keys = keyCols.map(col)
    val x = series
      .filter(col(tCol).isNotNull && col(vCol).isNotNull)
      .select(keys :+ col(tCol).cast("long").as("__t") :+
        col(vCol).cast("decimal(18,6)").as("__x"): _*)
    def lagErr(lag: Int, nName: String, sName: String): DataFrame = {
      val shifted = x.select(
        keys :+ (col("__t") + lit(lag.toLong)).as("__t") :+
          col("__x").as("__xp"): _*)
      x.join(shifted, keyCols :+ "__t")
        .groupBy(keys: _*)
        .agg(
          count(lit(1)).as(nName),
          sum(abs(col("__x") - col("__xp"))).as(sName))
    }
    val seasonal = lagErr(period, "n_pairs", "__se")
    val naive = lagErr(1, "n_naive", "__ne")
    val mae = col("__se").cast("double") / col("n_pairs").cast("double")
    val naiveMae = col("__ne").cast("double") / col("n_naive").cast("double")
    def q6(c: org.apache.spark.sql.Column) = floor(c * lit(1e6)) / lit(1e6)
    seasonal.join(naive, keyCols, "full_outer")
      .select(keys ++ Seq(
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        when(col("n_pairs") > 0, q6(mae)).as("mae"),
        coalesce(col("n_naive"), lit(0L)).as("n_naive"),
        when(col("n_naive") > 0, q6(naiveMae)).as("naive_mae"),
        when(col("n_pairs") > 0 && col("n_naive") > 0 && col("__ne") > 0,
          q6(mae / naiveMae)).as("mase")): _*)
  }

  /** Single change-point detection on an integer-valued series: the
    * split maximizing the standardized two-segment contrast
    *
    *   C(i) = |n·SL_i − i·S| / √(n·i·(n−i))
    *
    * (= √(i(n−i)/n)·|mean_L − mean_R|, the CUSUM-family statistic) —
    * "when did the level of this volume series shift?" for ingestion
    * monitors and corpus-mix audits.
    *
    * `vCol` must be integral (counts; quantize upstream for real
    * values): every moment is then an exact integer and the statistic
    * is one IEEE division + sqrt on exact integers — bit-identical in
    * any engine — floor-quantized to 6 dp with ties broken on the
    * earliest split.
    *
    * Scale shape: running sums come from [[graft.plans.Prefix]]'s
    * range-partitioned prefix pass (never a single-partition
    * `Window.orderBy`); totals are a one-row broadcast; the argmax is
    * a TakeOrdered(1). Driver state: one Long per partition.
    *
    * Output: one row (split_t, n_left, n_right, mean_left, mean_right,
    * cusum_stat) — `split_t` is the last index of the left segment.
    */
  def changepoint(series: DataFrame, tCol: String, vCol: String): DataFrame = {
    val x = series
      .filter(col(tCol).isNotNull && col(vCol).isNotNull)
      .select(col(tCol).cast("long").as("split_t"),
        col(vCol).cast("long").as("__x"))
      .withColumn("__one", lit(1L))
    val run = graft.plans.Prefix.withRunningSums(
      x, Seq(col("split_t")), Seq("__x" -> "__sl", "__one" -> "n_left"))
    val tot = x.agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
    val nD = col("__n").cast("double")
    val iD = col("n_left").cast("double")
    val slD = col("__sl").cast("double")
    val sD = col("__s").cast("double")
    val stat = abs(nD * slD - iD * sD) / sqrt(nD * iD * (nD - iD))
    run.crossJoin(broadcast(tot))
      .filter(col("n_left") < col("__n"))
      .select(
        col("split_t"), col("n_left"),
        (col("__n") - col("n_left")).as("n_right"),
        (floor(slD / iD * lit(1e6)) / lit(1e6)).as("mean_left"),
        (floor((sD - slD) / (nD - iD) * lit(1e6)) / lit(1e6))
          .as("mean_right"),
        (floor(stat * lit(1e6)) / lit(1e6)).as("cusum_stat"))
      .orderBy(col("cusum_stat").desc, col("split_t").asc)
      .limit(1)
  }

  /** Time-series similarity search: the `k` windows of an (hour-index,
    * value) series most Pearson-correlated with a fixed query pattern
    * — the distributed core of a matrix-profile/MASS-style motif scan
    * ("where does activity ramp like THIS?").
    *
    * Each point (t, v) is exploded to the `|query|` windows that
    * contain it (start = t − offset), tagged with the query weight at
    * its offset; one hash aggregate per window start then computes the
    * sliding moments. That is an equi-join-shaped shuffle keyed on the
    * window start — never a per-window re-scan, never a
    * single-partition global window; ×|query| fan-out is the
    * documented cost (the classic time × window-length trade).
    *
    * Determinism contract (same as `Olap.correlationMatrix`): the
    * query is quantized to 6 dp and all moments (Σv, Σv², Σv·q) are
    * DECIMAL-exact; the query-side constants (Σq, the query variance
    * term) are computed EXACTLY in BigDecimal here and the closed form
    * runs in double — bit-identical under any partitioning, and in any
    * engine that can sum decimals. Incomplete edge windows (fewer than
    * |query| points — the series is assumed dense; gap-fill upstream)
    * are dropped. Output: (start, corr) top-k by (corr desc, start) —
    * a TakeOrdered, each partition keeps k.
    */
  def slidingCorrelation(
      series: DataFrame, tCol: String, vCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    require(query.size >= 2, "query pattern needs at least 2 points")
    require(k >= 1, s"k must be positive: $k")
    val w = query.size
    val q6 = query.map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    val sq = q6.sum.toDouble
    val sqq = q6.map(x => x * x).sum.toDouble
    val qArr = array(q6.map(x => lit(x.toDouble).cast("decimal(18,6)")): _*)
    val v = col(vCol).cast("decimal(18,4)")
    val exploded = series
      .filter(col(tCol).isNotNull && col(vCol).isNotNull)
      .select(col(tCol).cast("long").as("__t"), v.as("__v"),
        posexplode(qArr).as(Seq("__i", "__q")))
      .withColumn("__start", col("__t") - col("__i"))
    val g = exploded.groupBy(col("__start").as("start"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col("__v")).cast("double").as("__sv"),
        sum(col("__v") * col("__v")).cast("double").as("__svv"),
        sum(col("__v") * col("__q")).cast("double").as("__svq"))
      .filter(col("__n") === w)
    val corr = (lit(w) * col("__svq") - col("__sv") * lit(sq)) /
      sqrt((lit(w) * col("__svv") - col("__sv") * col("__sv")) *
        (lit(w) * lit(sqq) - lit(sq) * lit(sq)))
    g.withColumn("corr", round(corr, 6))
      .select("start", "corr")
      .orderBy(col("corr").desc, col("start").asc)
      .limit(k)
  }

  /** Classical additive seasonal decomposition of the daily per-key
    * series (STL-lite / statsmodels `seasonal_decompose` shape):
    *
    *   value_d = trend_d + seasonal_dow(d) + resid_d
    *
    * trend = centered 7-row moving average (only FULL windows — the
    * first/last 3 days of each key are null, the classical edge rule);
    * seasonal = per day-of-week mean of the detrended series,
    * re-centered so the seven indices sum to ~0 (statsmodels subtracts
    * the unweighted mean of the period averages); resid = remainder.
    * The corpus-mix audit: "is Tuesday's volume dip seasonal or a real
    * shift?" — drift tests ([[Drift]]) fire on level changes; this
    * separates level from calendar.
    *
    * Determinism: daily sums are exact DECIMAL(18,4); every division
    * runs once in double on decimal-exact inputs and is floor-quantized
    * (⌊x·10⁶⌋/10⁶ — tie-free cross-engine, see [[autocorrelation]]);
    * differences of already-quantized doubles are exact IEEE ops and
    * are re-quantized. Day-of-week is Sunday=1..7 (DuckDB mirror:
    * `dayofweek(d)+1`).
    *
    * Scale shape: one date-keyed aggregate collapses the event stream;
    * every window after that is keyed per-key over the DAILY frame
    * (bounded by days of history, never event volume — no
    * single-partition window); the seasonal index table is key×7 rows
    * joined back broadcast-small.
    *
    * Output: (key, d, dow, value, trend, seasonal, resid) — seasonal is
    * defined for any dow with at least one full-trend day; resid only
    * where trend is.
    */
  def seasonalDecompose(
      df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    def q6(c: org.apache.spark.sql.Column) = floor(c * lit(1e6)) / lit(1e6)
    val daily = df
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(keyCol), to_date(col(tsCol)).as("d"))
      .agg(sum(col(valueCol).cast("decimal(18,4)")).as("__v"))
    val w7 = Window.partitionBy(col(keyCol)).orderBy(col("d"))
      .rowsBetween(-3, 3)
    val t = daily
      .withColumn("trend", when(count(lit(1)).over(w7) === 7,
        q6(sum(col("__v")).over(w7).cast("double") / lit(7.0))))
      .withColumn("__detr", when(col("trend").isNotNull,
        q6(col("__v").cast("double") - col("trend"))))
      .withColumn("dow", dayofweek(col("d")))
    val seas = t
      .filter(col("__detr").isNotNull)
      .groupBy(col(keyCol), col("dow"))
      .agg(q6(sum(col("__detr").cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("__s_raw"))
    val wk = Window.partitionBy(col(keyCol))
    val seasC = seas
      .withColumn("__m",
        q6(sum(col("__s_raw").cast("decimal(18,6)")).over(wk).cast("double") /
          count(lit(1)).over(wk)))
      .select(col(keyCol), col("dow"), q6(col("__s_raw") - col("__m"))
        .as("seasonal"))
    t.join(seasC, Seq(keyCol, "dow"), "left")
      .select(col(keyCol), col("d"), col("dow"),
        col("__v").cast("double").as("value"), col("trend"), col("seasonal"),
        when(col("__detr").isNotNull, q6(col("__detr") - col("seasonal")))
          .as("resid"))
  }
}
