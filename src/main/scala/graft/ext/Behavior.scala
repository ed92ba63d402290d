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
}
