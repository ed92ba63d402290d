package graft

/** Inventory contract: every declared query has an oracle and every
  * oracle has a query — the driver records a weaker rows-only check
  * for any gap, and a mismatched key silently orphans an oracle. The
  * count assertion keeps SURVEY.md's totals honest (they drifted once
  * when updated by hand).
  */
class InventorySpec extends SparkSpec {
  test("queries and oracles are exactly 1:1") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
    assert(q.size === 200, s"inventory size changed: ${q.size} — update SURVEY.md totals")
  }
}
