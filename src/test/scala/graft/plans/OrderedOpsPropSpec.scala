package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property tests for the order-sensitive distributed primitives — the
  * code where a partitioning bug would corrupt results silently:
  * [[Prefix.withRunningSum]] (carry-in offsets across partitions) and
  * [[graft.ext.Sampling.quotaCap]] / TopKAgg (bounded-heap partial
  * merge). Both are checked against their single-partition window
  * reference plans over randomized sizes, values, and partition counts.
  */
class OrderedOpsPropSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val caseGen: Gen[(Int, Int, List[Long])] = for {
    rows <- Gen.choose(0, 400)
    parts <- Gen.choose(1, 9)
    vals <- Gen.listOfN(rows, Gen.choose(0L, 1000L))
  } yield (rows, parts, vals)

  test("Prefix.withRunningSum == window cumsum for random sizes/partitions") {
    forAllSeeded(caseGen, 12) { case (rows, parts, vals) =>
      val df = vals.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
        .repartition(parts) // scrambled physical layout
      val expected = df
        .withColumn("cum", sum($"v").over(Window.orderBy($"id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"id", $"cum").as[(Long, Long)].collect().toMap
      val got = Prefix.withRunningSum(df, Seq($"id"), "v", "cum",
        Some(math.max(1, parts / 2)))
        .select($"id", $"cum").as[(Long, Long)].collect().toMap
      assert(got === expected, s"rows=$rows parts=$parts")
    }
  }

  private val quotaGen: Gen[(Int, Int, Int, List[(Int, Long)])] = for {
    rows <- Gen.choose(0, 500)
    groups <- Gen.choose(1, 6)
    k <- Gen.choose(1, 12)
    data <- Gen.listOfN(rows, for {
      g <- Gen.choose(0, groups - 1)
      s <- Gen.choose(0L, 30L) // small range forces score ties
    } yield (g, s))
  } yield (rows, groups, k, data)

  test("quotaCap/TopKAgg == window top-k for random groups/ties/k") {
    forAllSeeded(quotaGen, 12) { case (rows, groups, k, data) =>
      val df = data.zipWithIndex
        .map { case ((g, s), i) => (s"g$g", i.toLong, s) }
        .toDF("g", "id", "score")
        .repartition(7)
      val expected = df
        .withColumn("rank", row_number().over(Window.partitionBy($"g")
          .orderBy($"score".desc, $"id".asc)))
        .filter($"rank" <= k)
        .select($"g", $"id", $"score".cast("double"), $"rank".cast("long"))
        .as[(String, Long, Double, Long)].collect().toSet
      val got = graft.ext.Sampling.quotaCap(df, Seq("g"), "score", "id", k)
        .select($"g", $"id", $"score", $"rank")
        .as[(String, Long, Double, Long)].collect().toSet
      assert(got === expected, s"rows=$rows groups=$groups k=$k")
    }
  }
}
