package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import graft.{SparkEntry, SparkSpec}

/** Pin: every inventory query that plans a single-partition window
  * (WindowExec with no partitionSpec — Spark's "Moving all data to a
  * single partition" warning at runtime) is on the allowlist below,
  * with its boundedness argument. A new offender — an unpartitioned
  * window over UNBOUNDED input, the classic billion-row single-task
  * plan — fails this spec before it can reach a cluster.
  *
  * Detection is structural (walk the initial physical plan incl.
  * subqueries for WindowExec nodes with an empty partitionSpec), not
  * log-scraping: the WindowExec warning is emitted through a logger
  * this test JVM has below WARN, so a log-based audit passes vacuously.
  */
class WindowPartitionAuditSpec extends SparkSpec {

  /** Queries allowed to plan a single-partition window, each with the
    * reason the input is BOUNDED at that point (one partition is the
    * correct, cheap plan for a handful of rows — not a scale bug).
    *
    * Both entries are `Sampling.largestRemainderAllocate`'s Hamilton
    * rank `row_number().over(orderBy(__frac))`: its input is one row
    * per STRATUM (the `source` column — single digits here, at most
    * thousands in any real corpus mix), already reduced by a full
    * aggregate. Ranking |strata| rows on one task is the right plan;
    * partitioning it would shuffle for nothing.
    */
  private val allowlist: Map[String, String] = Map(
    "q_mix_temp_general" -> ("temperatureAllocate → " +
      "largestRemainderAllocate ranks one row per source (bounded strata)"),
    "q_mix_plan" -> ("mixing-plan allocation → " +
      "largestRemainderAllocate ranks one row per source (bounded strata)"),
    "q_mix_capped" -> ("cappedAllocate water-filling loop → one Hamilton " +
      "rank per iteration, each over one row per source (bounded strata; " +
      "the count scales with cap iterations, never with corpus rows)"),
  )
  // NOT listed: q_train_manifest also runs largestRemainderAllocate, but
  // eagerly at CONSTRUCTION time (its allocation sub-job executes before
  // the returned frame's plan exists), so the final plan this audit
  // walks cannot contain it. Same bounded-strata shape as the three
  // above — Spark's runtime warning for it is attributed there.

  private def unpartitionedWindows(df: DataFrame): Int = {
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    strip(df.queryExecution.executedPlan).collectWithSubqueries {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.size
  }

  test("single-partition windows appear ONLY in allowlisted queries " +
    "(each bounded by construction)") {
    // Canary: the detector must see a deliberate unpartitioned window,
    // or a Spark plan-shape change silently turns this audit vacuous.
    {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val bad = spark.range(10).toDF("v")
        .withColumn("r", row_number().over(Window.orderBy(col("v"))))
      assert(unpartitionedWindows(bad) === 1, "detector canary failed")
    }
    val sfDir = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.SortedMap.empty[String, Int]
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (k, fn) =>
        val n = unpartitionedWindows(fn(spark, sfDir))
        if (n > 0) offenders(k) = n
      }
    } finally spark.catalog.clearCache()
    assert(offenders.keySet === allowlist.keySet,
      s"single-partition window audit mismatch: offenders=$offenders " +
        s"allowlist=${allowlist.keySet} — an unlisted offender needs a " +
        "boundedness argument here or a re-plan; a stale entry should " +
        "be removed")
  }
}
