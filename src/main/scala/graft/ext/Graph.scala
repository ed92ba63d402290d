package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Graph analytics over pair tables the engine already produces
  * (co-purchase edges, near-dup pairs). No reference equivalent
  * (north-star extension per BASELINE.json).
  *
  * Complements [[Dedup.clusterPairs]] (connected components): where CC
  * answers "which nodes belong together", PageRank answers "which
  * nodes matter" — item importance on the co-purchase graph, document
  * authority on a citation/link graph.
  */
object Graph {

  /** Fixed-iteration PageRank. Per iteration, for every node v:
    *   pr'(v) = q12((1−d)/N + d · (Σ_{u→v} ⌊pr(u)/outdeg(u)·10¹²⌋) / 10¹²)
    * where q12 is TRUNCATION to 12 dp (⌊x·10¹²⌋/10¹²). Simple
    * variant: dangling-node mass is NOT redistributed (it decays) —
    * ranking order is what this is for, and the formula stays one
    * join + one aggregate per iteration in any engine.
    *
    * Determinism contract: quantization is floor-based, NOT round() —
    * repeated 12-dp quantization + division by small integers lands
    * on EXACT decimal halves constantly, where engines' rounding
    * tie-break rules disagree (observed: Spark HALF_UP vs DuckDB at
    * the 12th dp); floor has no tie to break, and identical doubles
    * floor identically everywhere. The only order-sensitive op — the
    * in-neighbor sum — adds the ⌊·10¹²⌋ contributions as exact
    * INTEGERS (bounded by total rank mass ≤ 10¹² per node, far inside
    * 2⁵³), so partial-aggregation order cannot perturb it. Everything
    * else is scalar double math with mirrored shapes; oracle-checked
    * by unrolling the same iterations in SQL.
    *
    * Scale shape per iteration: one shuffle join of edges to the rank
    * table on src (both sides key-partitioned; AQE broadcast-flips
    * small rank tables), one map-side-combinable sum keyed on dst, one
    * left join back to the node set. Each iteration is persisted and
    * the previous one released — lineage stays O(1) deep, the
    * iterative-job pattern [[Dedup.clusterPairs]] uses. Driver state:
    * nothing but the loop counter.
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(damping > 0 && damping < 1, s"damping in (0,1): $damping")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .persist()
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node")))
      .distinct().persist()
    val outdeg = e.groupBy(col("__src"))
      .agg(count(lit(1)).as("__outdeg")).persist()
    val n1 = nodes.agg(count(lit(1)).as("__n"))
    // 12-dp truncation: floor of the micro-unit double, back to double
    def q12(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e12)).cast("double") / lit(1e12)
    var pr = nodes.crossJoin(broadcast(n1))
      .select(col("node"),
        q12(lit(1.0) / col("__n").cast("double")).as("pr"))
      .persist()
    pr.count() // materialize before the loop starts swapping caches
    for (_ <- 1 to iters) {
      val contrib = e
        .join(pr, e("__src") === pr("node"))
        .join(outdeg, "__src")
        .select(col("__dst").as("node"),
          floor(col("pr") / col("__outdeg").cast("double") * lit(1e12))
            .as("__t"))
        .groupBy("node")
        .agg(sum(col("__t")).as("__s"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(n1))
        .select(col("node"),
          q12(lit(1.0 - damping) / col("__n").cast("double") +
            lit(damping) *
              (coalesce(col("__s"), lit(0L)).cast("double") / lit(1e12)))
            .as("pr"))
        .persist()
      next.count() // materialize, then release the previous generation
      pr.unpersist(blocking = false)
      pr = next
    }
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    outdeg.unpersist(blocking = false)
    pr
  }
}
