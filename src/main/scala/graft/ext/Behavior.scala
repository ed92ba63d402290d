package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] User-behavior analytics over the event stream: retention
  * cohorts and ordered funnels. No reference equivalent (north-star
  * extension per BASELINE.json).
  *
  * Scale notes (100 TB):
  *   - retention is ONE shuffle on the user key: the cohort assignment
  *     is a window-min over the same hash partitioning the final
  *     aggregate reuses — no second scan, no join back to the raw
  *     events;
  *   - the funnel folds into one aggregate per stage, each joined on
  *     the user key; after the first shuffle every stage join is
  *     co-partitioned (and the per-stage aggregates shrink
  *     monotonically, so AQE broadcasts the later ones).
  */
object Behavior {

  /** Weekly retention cohorts: users are cohorted by the ISO week of
    * their first event; each (cohort_week, week_offset) cell counts
    * the distinct users of that cohort active in that week.
    *
    * Both sides of the offset subtraction are week-truncated, so the
    * day difference is an exact multiple of 7 and the integer division
    * is lossless.
    */
  def retentionWeekly(
      df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    df
      .withColumn("__cohort",
        to_date(date_trunc("week", min(col(tsCol)).over(w))))
      .withColumn("__week",
        to_date(date_trunc("week", col(tsCol))))
      .groupBy(
        col("__cohort").as("cohort_week"),
        (datediff(col("__week"), col("__cohort")) / 7)
          .cast("long").as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Ordered funnel: for each user, stage i counts only if it has an
    * event STRICTLY after the user's stage i-1 time (sequential-min
    * semantics — a purchase logged before the first view does not
    * convert). Returns one row per stage:
    * (stage_ord, stage_name, n_users).
    */
  def funnel(
      df: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = df.sparkSession
    import spark.implicits._

    val head = df.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    val perUser = steps.zipWithIndex.tail.foldLeft(head) {
      case (acc, (step, i)) =>
        val stage = df.filter(col(typeCol) === step)
          .join(acc.select(col(userCol), col(s"t${i - 1}")), userCol)
          .filter(col(tsCol) > col(s"t${i - 1}"))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t$i"))
        acc.join(stage, Seq(userCol), "left")
    }
    val counts = perUser.agg(
      count(lit(1)).as("c0"),
      steps.indices.tail.map(i => count(col(s"t$i")).as(s"c$i")): _*)
    val stageRows = array(steps.zipWithIndex.map { case (step, i) =>
      struct(
        lit(i + 1).cast("long").as("stage_ord"),
        lit(step).as("stage_name"),
        col(s"c$i").as("n_users"))
    }: _*)
    counts.select(explode(stageRows).as("s")).select("s.*")
  }

  /** Cohort lifetime value: users cohorted by the ISO week of their
    * first event (ANY type — acquisition week), then `valueCol` over
    * `revenueType` events summed per (cohort_week, week_offset). Read
    * along a row: how a cohort's spend decays with age; down a column
    * offset: whether newer cohorts monetize better — the revenue
    * companion to [[retentionWeekly]]'s activity curve.
    *
    * Scale + determinism shape: same ONE user-key shuffle as retention
    * (cohort assignment is a window-min over the user partition the
    * final aggregate reuses); revenue sums are exact DECIMAL(18,4), so
    * partial-aggregation order cannot drift them; the double cast
    * happens once at output.
    */
  def cohortLtv(
      df: DataFrame, userCol: String, typeCol: String, tsCol: String,
      valueCol: String, revenueType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    df
      .withColumn("__cohort",
        to_date(date_trunc("week", min(col(tsCol)).over(w))))
      .filter(col(typeCol) === revenueType)
      .withColumn("__week", to_date(date_trunc("week", col(tsCol))))
      .groupBy(
        col("__cohort").as("cohort_week"),
        (datediff(col("__week"), col("__cohort")) / 7)
          .cast("long").as("week_offset"))
      .agg(
        sum(col(valueCol).cast("decimal(18,4)")).cast("double")
          .as("revenue"),
        countDistinct(col(userCol)).as("n_buyers"))
  }

  /** Daily audience growth: per day, how many users were seen for the
    * FIRST time, and the cumulative distinct-user count to date. The
    * classic "DAU is flat — are we acquiring or churning?" curve, and
    * a corpus-growth counter when `userCol` is a source/author id.
    *
    * Scale shape: first-seen is a user-keyed min aggregate (one
    * shuffle, map-side combinable), day counts collapse that to ≤ one
    * row per DAY — after which the running sum's single-partition
    * ordered window is over a calendar-bounded frame (years of daily
    * rows ≈ thousands), not over users or events. That bound is why
    * this window is acceptable where a per-row global window is not
    * (cf. [[graft.plans.Ordinal]] for the unbounded case).
    */
  def cumulativeDistinctUsers(
      df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstSeen = df
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol))
      .agg(to_date(min(col(tsCol))).as("day"))
    val daily = firstSeen.groupBy(col("day"))
      .agg(count(lit(1)).as("n_new_users"))
    daily
      .withColumn("n_cumulative_users",
        sum(col("n_new_users")).over(
          Window.orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Last-touch attribution: each conversion event is credited to the
    * user's most recent PRECEDING touch event within `windowDays`
    * (channel = that touch's type), or to "direct" when no touch
    * qualifies. One row per conversion:
    * (conversion id, user, conv_ts, value, channel, touch_ts).
    *
    * Determinism: events are ordered by (ts, id) inside each user —
    * simultaneous-timestamp rows cannot flip the "latest touch" across
    * engines or partitionings; the credited touch is a conditional
    * last-non-null over ROWS … 1 PRECEDING, so a conversion at the
    * same instant as a touch does NOT credit it (strictly-preceding
    * row semantics, mirrored in the oracle).
    *
    * Scale shape: ONE user-keyed shuffle; the window walks each user's
    * history in ts order. Per-user history is the natural bound — for
    * pathological hot users cap upstream ([[graft.ext.Sampling]]
    * quotaCap), which no window strategy can do for you.
    */
  def lastTouchAttribution(
      df: DataFrame, idCol: String, userCol: String, typeCol: String,
      tsCol: String, valueCol: String,
      conversionType: String, touchTypes: Seq[String],
      windowDays: Int): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(windowDays > 0, s"windowDays must be positive: $windowDays")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol).isin(touchTypes: _*),
      struct(col(tsCol).as("ts"), col(typeCol).as("ch")))
    df
      .withColumn("__touch", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .withColumn("__qualified",
        col("__touch").isNotNull &&
          col("__touch.ts") >= col(tsCol) - expr(s"INTERVAL $windowDays DAYS"))
      .select(
        col(idCol),
        col(userCol),
        col(tsCol).as("conv_ts"),
        col(valueCol).as("conv_value"),
        when(col("__qualified"), col("__touch.ch"))
          .otherwise(lit("direct")).as("channel"),
        when(col("__qualified"), col("__touch.ts")).as("touch_ts"))
  }
}
