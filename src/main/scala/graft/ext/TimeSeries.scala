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
}
