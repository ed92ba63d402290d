package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Single-partition plan audit — THE one collector and allowlist,
  * consumed by PlanAuditSpec (the tripwire) and the CLI main below so
  * they cannot drift.
  *
  * A `WindowExec` with an empty partition spec, or any shuffle
  * exchange into ONE partition, routes every input row through one
  * task — invisible at local test scale, fatal at 100 TB. Two forms
  * are legitimate, and only these:
  *
  *   1. the global-aggregate merge — a 1-partition exchange whose
  *      child aggregates with ZERO grouping keys, so at most one row
  *      leaves each upstream partition (a KEYED partial below a
  *      single-partition exchange would move #distinct-keys rows and
  *      is NOT exempt);
  *   2. a global window/exchange over an already-bounded intermediate
  *      (a per-source aggregate, a top-k, a vocabulary), allowlisted
  *      in [[boundedAllowlist]] with the bound stated.
  */
object PlanAudit {

  /** key → why its single-partition shape survives any corpus scale.
    *
    * All three are `Sampling.largestRemainderAllocate`'s Hamilton rank
    * `row_number().over(orderBy(__frac))` (and its feeding exchanges):
    * input is one row per STRATUM (`source` — single digits here, at
    * most thousands in any real corpus mix), already reduced by a
    * full aggregate. Ranking |strata| rows on one task is the right
    * plan; partitioning it would shuffle for nothing.
    *
    * NOT listed: q_train_manifest also runs largestRemainderAllocate,
    * but eagerly at CONSTRUCTION time (the allocation sub-job executes
    * before the returned frame's plan exists), so the final plan this
    * audit walks cannot contain it.
    */
  val boundedAllowlist: Map[String, String] = Map(
    "q_mix_plan" -> ("mixing-plan allocation → largestRemainderAllocate "
      + "ranks one row per source (bounded strata)"),
    "q_mix_capped" -> ("cappedAllocate water-filling loop → one Hamilton "
      + "rank per iteration, each over one row per source (bounded "
      + "strata; count scales with cap iterations, never corpus rows)"),
    "q_mix_temp_general" -> ("temperatureAllocate → "
      + "largestRemainderAllocate ranks one row per source (bounded "
      + "strata)"))

  /** The fully-prepared static physical plan: exchanges inserted,
    * AQE wrapper stripped to its initial plan.
    */
  def preparedPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case c: WholeStageCodegenExec => unwrap(c.child)
    case c: InputAdapter => unwrap(c.child)
    case other => other
  }

  /** True only for the provably-bounded exchange shape: the child
    * aggregates with zero grouping keys, so each upstream partition
    * contributes at most one row regardless of aggregate mode.
    */
  private def isGlobalAggMerge(e: ShuffleExchangeExec): Boolean =
    unwrap(e.child) match {
      case a: BaseAggregateExec => a.groupingExpressions.isEmpty
      case _ => false
    }

  /** Every unbounded single-partition shape in the plan, including
    * inside subquery plans: (kind, node) pairs.
    */
  def singlePartitionShapes(plan: SparkPlan): Seq[(String, SparkPlan)] =
    plan.collectWithSubqueries {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        ("global-window", w: SparkPlan)
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
        ("global-window-limit", w: SparkPlan)
      case e: ShuffleExchangeExec
          if e.outputPartitioning.numPartitions == 1 &&
            !isGlobalAggMerge(e) =>
        ("single-partition-exchange", e: SparkPlan)
    }

  /** CLI: print every flagged query.
    * Usage: runMain graft.PlanAudit <sfDir> [keyPrefix]
    */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanAudit <sfDir> [keyPrefix]")
    val dir = args(0)
    val prefix = args.lift(1).getOrElse("")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.prepare(spark)
    var flagged = 0
    var allowlisted = 0
    SparkEntry.queries.keys.toSeq.sorted
      .filter(_.startsWith(prefix)).foreach { k =>
        try {
          val df = SparkEntry.queries(k)(spark, dir)
          singlePartitionShapes(preparedPlan(df)).foreach { case (kind, w) =>
            // Allowlisted (documented-bounded) shapes are reported but
            // counted separately: the summary line must not label a
            // bounded-strata rank an "unbounded" site.
            val listed = boundedAllowlist.contains(k)
            if (listed) allowlisted += 1 else flagged += 1
            val tag = if (listed) " [allowlisted]" else ""
            println(s"FLAG $k $kind ${w.getClass.getSimpleName}$tag")
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            println(s"ERR  $k ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    println(s"== $flagged unbounded single-partition site(s), " +
      s"$allowlisted documented-bounded (allowlisted) ==")
    spark.stop()
  }
}
