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
}
