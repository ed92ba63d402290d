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
    * Scale shape per iteration: the per-edge out-degree divide is
    * pre-joined ONCE before the loop (edges ⋈ outdeg is
    * rank-independent — paying it per iteration was pure waste), so
    * an iteration is one join of the cached edge table to the rank
    * table on src, one map-side-combinable sum keyed on dst, one
    * left join back to the node set. When the node count (already
    * materialized for the 1/N seed) is at most `broadcastMaxNodes`,
    * the rank/contribution tables are explicitly BROADCAST — the
    * planLeaf re-rooting erases stats, so Catalyst would otherwise
    * plan a full edge shuffle per iteration (measured 7.5 s → ~2 s
    * at sf0.1); past that bound the plan falls back to the
    * key-partitioned shuffle joins, which is the right shape for
    * billion-node graphs. Each rank generation is re-rooted
    * at its physical RDD ([[org.apache.spark.sql.GraftExpressionBridge.planLeaf]])
    * then persisted/materialized/released — a persist-only loop keeps
    * the full logical history, so analysis cost grows per iteration
    * and the total planning tax is O(iters²) (measured: the leaf wrap
    * took solo q_pagerank 10.7 s → 5.8 s at sf0.1 over 3 iterations).
    * Unlike `localCheckpoint`, RDD lineage survives, so a lost cached
    * block recomputes instead of failing the job on a preemptible
    * fleet. Driver state: nothing but the loop counter.
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85,
      broadcastMaxNodes: Long = 1L << 20): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(damping > 0 && damping < 1, s"damping in (0,1): $damping")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .persist()
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node")))
      .distinct().persist()
    // Rank-independent: join the per-source out-degree onto the edge
    // table ONCE, outside the loop.
    val e2 = e.join(
        e.groupBy(col("__src")).agg(count(lit(1)).as("__outdeg")), "__src")
      .persist()
    val nNodes = nodes.count()
    val small = nNodes <= broadcastMaxNodes
    def maybeBcast(df: DataFrame) = if (small) broadcast(df) else df
    // nNodes is already a driver Long (it gates the broadcast), so
    // 1/N is a LITERAL — the former one-row aggregate and its
    // crossJoin(broadcast) per iteration bought nothing.
    val invN = lit(1.0) / lit(nNodes.toDouble)
    // 12-dp truncation: floor of the micro-unit double, back to double
    def q12(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e12)).cast("double") / lit(1e12)
    import org.apache.spark.sql.GraftExpressionBridge.planLeaf
    var pr = planLeaf(nodes
      .select(col("node"), q12(invN).as("pr")))
      .persist()
    pr.count() // materialize before the loop starts swapping caches
    // e2 is fully derivable from e; materialize it now so the raw
    // edge cache can be released instead of riding the whole loop
    e2.count()
    e.unpersist(blocking = false)
    for (_ <- 1 to iters) {
      val contrib = e2
        .join(maybeBcast(pr), e2("__src") === pr("node"))
        .select(col("__dst").as("node"),
          floor(col("pr") / col("__outdeg").cast("double") * lit(1e12))
            .as("__t"))
        .groupBy("node")
        .agg(sum(col("__t")).as("__s"))
      val next = planLeaf(nodes.join(maybeBcast(contrib), Seq("node"), "left")
        .select(col("node"),
          q12(lit(1.0 - damping) / lit(nNodes.toDouble) +
            lit(damping) *
              (coalesce(col("__s"), lit(0L)).cast("double") / lit(1e12)))
            .as("pr")))
        .persist()
      next.count() // materialize, then release the previous generation
      pr.unpersist(blocking = false)
      pr = next
    }
    e2.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    pr
  }

  /** Global triangle count over an undirected edge list — the
    * clustering-coefficient numerator, the classic "is this graph
    * community-shaped or star-shaped?" statistic (and a spam signal on
    * co-occurrence graphs: organic neighborhoods close triangles,
    * scripted ones don't).
    *
    * Algorithm: compact-forward with DEGREE orientation. Each
    * undirected edge becomes one directed edge low→high in the total
    * order (degree, node) — so every wedge is generated exactly once,
    * at its lowest-degree corner. Wedges (u→v, u→w) equi-join edges on
    * the source; a second equi-join checks the closing edge v→w.
    * Degree orientation is what survives power-law graphs: a hub of
    * degree d contributes wedges only toward HIGHER-degree nodes, so
    * the join fan-out is Σ d_out² = O(m^1.5) instead of the Σ d² =
    * O(m·d_max) of id-ordering — on a 100 TB co-occurrence graph with
    * million-degree hubs, that exponent is the whole ballgame.
    *
    * Input edges may carry duplicates, self-loops, or both directions;
    * they are normalized away first. Output: one row, `n_triangles`.
    */
  def triangleCount(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // und feeds degree computation, both wedge sides, and the closing-
    // edge probe; oriented feeds two join sides. Without persist the
    // whole upstream edge derivation re-executes per reference —
    // measured on the co-purchase inventory query: 23 source scans
    // (AQE exchange reuse recovers only sibling-identical subtrees).
    // Same persist-and-let-the-caller-clear pattern as the LSH
    // signature tables.
    val und = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
      .persist()
    val deg = und.select(col("a").as("n"))
      .union(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // Orient low→high in the (degree, node) total order.
    val oriented = und
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .persist()
    // Wedge corners pair in VALUE order (any strict order dedupes the
    // pair); the closing-edge probe then hits the value-canonical
    // `und` as a single equi-join — an OR over both degree-orientation
    // directions would degenerate to a nested loop.
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.v").as("w1"), col("e2.v").as("w2"))
    wedges
      .join(und, col("a") === col("w1") && col("b") === col("w2"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
