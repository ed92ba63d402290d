package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank fixes a symmetric 2-cycle at 1/2 each") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val out = Graph.pageRank(edges, "s", "d", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 0.5, 2L -> 0.5))
  }

  test("pageRank decays dangling mass and matches the hand-rolled recursion") {
    // a -> b only: b is dangling (its mass leaks, by documented design)
    val edges = Seq((1L, 2L)).toDF("s", "d")
    // same floor-quantization chain as the operator
    def q12(v: Double) = math.floor(v * 1e12) / 1e12
    var pa = q12(1.0 / 2); var pb = q12(1.0 / 2)
    (1 to 3).foreach { _ =>
      val contribB = math.floor(pa / 1 * 1e12)
      val na = q12((1 - 0.85) / 2)
      val nb = q12((1 - 0.85) / 2 + 0.85 * (contribB / 1e12))
      pa = na; pb = nb
    }
    val out = Graph.pageRank(edges, "s", "d", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> pa, 2L -> pb))
  }

  test("pageRank ranks the hub of a star above its spokes") {
    val spokes = (2L to 6L)
    val edges = (spokes.map(s => (s, 1L)) ++ spokes.map(s => (1L, s)))
      .toDF("s", "d")
    val out = Graph.pageRank(edges, "s", "d", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(spokes.forall(s => out(1L) > out(s)))
    // spokes are symmetric: identical ranks
    assert(spokes.map(out).toSet.size == 1)
  }

  test("pageRank is invariant to input partitioning (decimal contribution sums)") {
    val edges = (1L to 200L).map(i => (i, (i * 7) % 200 + 1))
    val one = Graph.pageRank(edges.toDF("s", "d").repartition(1), "s", "d", 3)
      .as[(Long, Double)].collect().toMap
    val many = Graph.pageRank(edges.toDF("s", "d").repartition(16), "s", "d", 3)
      .as[(Long, Double)].collect().toMap
    assert(one == many && one.size > 100)
  }

  private def tri(edges: Seq[(Long, Long)]): Long =
    Graph.triangleCount(edges.toDF("s", "d"), "s", "d")
      .as[Long].head()

  test("triangleCount on known graphs") {
    // K4: every 3-subset closes -> C(4,3) = 4
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(tri(k4) === 4L)
    // path graph: no triangles
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === 0L)
    // square + one diagonal: two triangles
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))) === 2L)
  }

  test("triangleCount normalizes duplicates, reverses, and self-loops") {
    val noisy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L),
      (1L, 3L), (3L, 3L), (1L, 1L))
    assert(tri(noisy) === 1L)
  }

  test("triangleCount plans equi-joins only — no nested loop") {
    val plan = Graph.triangleCount(
      Seq((1L, 2L), (2L, 3L)).toDF("s", "d"), "s", "d")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("pageRank broadcast and shuffle paths are bit-identical") {
    // broadcastMaxNodes = 0 forces the key-partitioned shuffle plan;
    // the default broadcasts — same exact-integer contribution sums,
    // so the two physical strategies must agree to the last bit
    val edges = (1L to 60L).flatMap { i =>
      Seq((i, i % 7 + 1), (i % 11 + 1, i), (i, (i * 3) % 13 + 1))
    }.toDF("s", "d")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("node").as[(Long, Double)].collect().toSeq
    val bcast = canon(Graph.pageRank(edges, "s", "d", iters = 4))
    val shuf = canon(Graph.pageRank(edges, "s", "d", iters = 4,
      broadcastMaxNodes = 0L))
    assert(bcast.map(_._1) === shuf.map(_._1))
    bcast.zip(shuf).foreach { case ((n, a), (_, b)) =>
      assert(java.lang.Double.doubleToLongBits(a) ===
        java.lang.Double.doubleToLongBits(b), s"node $n")
    }
  }
}
