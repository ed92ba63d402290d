package graft

import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Single-partition-shape tripwire over the WHOLE inventory: a
  * `WindowExec` with an empty partition spec routes every input row
  * through one task — invisible at local[32] test scale, fatal at
  * 100 TB. The only legitimate form is a global window over an
  * already-bounded intermediate (a per-source aggregate, a top-k,
  * a vocabulary), and those sites are allowlisted HERE with the bound
  * stated. Adding a global window anywhere else fails this spec until
  * it is either re-expressed (plans.Prefix / plans.Ordinal /
  * pre-aggregation) or proven bounded and allowlisted.
  */
class PlanAuditSpec extends SparkSpec {

  /** key → why its global window survives any corpus scale. */
  private val boundedAllowlist: Map[String, String] = Map(
    "q_mix_plan" -> "window input is groupBy(source) — rows = #sources",
    "q_mix_capped" -> "water-filling over per-source aggregate rows",
    "q_mix_temp_general" -> "Hamilton apportionment over per-source rows")

  test("no inventory query plans a global (empty-partition) window " +
    "outside the documented source-bounded allowlist") {
    val dir = "/root/testdata/sf0.001"
    val flagged = SparkEntry.queries.keys.toSeq.sorted.flatMap { k =>
      val plan = SparkEntry.queries(k)(spark, dir).queryExecution.sparkPlan
      val hits = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
      }
      if (hits.nonEmpty) Seq(k) else Nil
    }.distinct
    val unexpected = flagged.filterNot(boundedAllowlist.contains)
    assert(unexpected.isEmpty,
      s"global-window plans outside the allowlist: $unexpected — " +
        "re-express via plans.Prefix/Ordinal or prove the input " +
        "bounded and allowlist it with the bound stated")
    // the allowlist must not go stale either: every entry still flags
    val stale = boundedAllowlist.keySet -- flagged.toSet
    assert(stale.isEmpty,
      s"allowlisted queries no longer plan a global window: $stale — " +
        "drop them from the allowlist")
  }
}
