package graft

import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Single-partition-shape tripwire over the WHOLE inventory: a
  * `WindowExec` with an empty partition spec, or any shuffle exchange
  * into ONE partition, routes every input row through one task —
  * invisible at local[32] test scale, fatal at 100 TB. Two forms are
  * legitimate and only these:
  *
  *   1. the global-aggregate merge — a 1-partition exchange whose
  *      child is a PARTIAL aggregate, so what moves is one combined
  *      row per upstream partition, never data rows;
  *   2. a global window/exchange over an already-bounded intermediate
  *      (a per-source aggregate, a top-k, a vocabulary), allowlisted
  *      HERE with the bound stated.
  *
  * Adding a single-partition shape anywhere else fails this spec until
  * it is re-expressed (plans.Prefix / plans.Ordinal / pre-aggregation)
  * or proven bounded and allowlisted.
  */
class PlanAuditSpec extends SparkSpec {

  /** key → why its global window/exchange survives any corpus scale. */
  private val boundedAllowlist: Map[String, String] = Map(
    "q_mix_plan" -> "window input is groupBy(source) — rows = #sources",
    "q_mix_capped" -> "water-filling over per-source aggregate rows",
    "q_mix_temp_general" -> "Hamilton apportionment over per-source rows")

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case c: WholeStageCodegenExec => unwrap(c.child)
    case c: InputAdapter => unwrap(c.child)
    case other => other
  }

  private def isPartialAggMerge(e: ShuffleExchangeExec): Boolean =
    unwrap(e.child) match {
      case a: BaseAggregateExec =>
        // zero grouping keys → the stage below the exchange emits at
        // most ONE row per partition whatever its mode (this includes
        // the keys=[] functions=[] existence-reduction shape); a keyed
        // aggregate is only safe when it's the PARTIAL half of a merge
        a.groupingExpressions.isEmpty ||
          (a.aggregateExpressions.nonEmpty &&
            a.aggregateExpressions.forall(_.mode.toString.contains("Partial")))
      case _ => false
    }

  test("no inventory query plans a single-partition window or exchange " +
    "outside the partial-agg merge and the documented bounded allowlist") {
    val dir = "/root/testdata/sf0.001"
    // AQE off so executedPlan is the fully-prepared static plan — with
    // AQE on, exchanges are inserted lazily per query stage and the
    // audit would see a pre-EnsureRequirements tree.
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val flagged = SparkEntry.queries.keys.toSeq.sorted.flatMap { k =>
        val plan =
          SparkEntry.queries(k)(spark, dir).queryExecution.executedPlan
        val hits = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
          case e: ShuffleExchangeExec
              if e.outputPartitioning.numPartitions == 1 &&
                !isPartialAggMerge(e) => e
        }
        if (hits.nonEmpty) Seq(k) else Nil
      }.distinct
      val unexpected = flagged.filterNot(boundedAllowlist.contains)
      assert(unexpected.isEmpty,
        s"single-partition plans outside the allowlist: $unexpected — " +
          "re-express via plans.Prefix/Ordinal or prove the input " +
          "bounded and allowlist it with the bound stated")
      // the allowlist must not go stale either: every entry still flags
      val stale = boundedAllowlist.keySet -- flagged.toSet
      assert(stale.isEmpty,
        s"allowlisted queries no longer plan a single-partition shape: " +
          s"$stale — drop them from the allowlist")
    } finally spark.conf.set("spark.sql.adaptive.enabled", before)
  }
}
