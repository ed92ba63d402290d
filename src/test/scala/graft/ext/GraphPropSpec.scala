package graft.ext

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property checks for the degree-oriented triangle count: on random
  * graphs (including duplicate/reversed/self-loop noise) the
  * compact-forward join pipeline must return EXACTLY the brute-force
  * triangle count — orientation must neither drop nor double-count.
  */
class GraphPropSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  // dense-ish random graphs on 10 nodes: high triangle probability,
  // with noise (self loops, both directions, duplicates) mixed in
  private val graphGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(40, for {
      a <- Gen.chooseNum(1L, 10L)
      b <- Gen.chooseNum(1L, 10L)
    } yield (a, b))

  private def bruteTriangles(edges: List[(Long, Long)]): Long = {
    val und = edges.collect {
      case (a, b) if a != b => (math.min(a, b), math.max(a, b))
    }.toSet
    val nodes = und.flatMap(e => Set(e._1, e._2)).toList.sorted
    nodes.combinations(3).count { case List(x, y, z) =>
      und((x, y)) && und((y, z)) && und((x, z))
    }
  }

  test("triangleCount equals brute force on random noisy graphs") {
    forAllSeeded(graphGen, 8) { edges =>
      val got = Graph.triangleCount(edges.toDF("s", "d"), "s", "d")
        .as[Long].head()
      assert(got === bruteTriangles(edges), s"edges: $edges")
    }
  }
}
