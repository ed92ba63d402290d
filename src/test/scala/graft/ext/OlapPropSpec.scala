package graft.ext

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property checks for the categorical-dependence statistics: the
  * distributed cell/margin pipelines must agree with straight-line
  * Scala references on random contingency tables — including sparse
  * tables where some (x, y) cells are never observed (the chi-square
  * zero-cell mass, the MI empty-cell silence).
  */
class OlapPropSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val tableGen: Gen[List[(String, String)]] =
    Gen.listOfN(120, for {
      x <- Gen.oneOf("a", "b", "c")
      y <- Gen.oneOf("p", "q", "r", "s")
    } yield (x, y))

  test("mutualInformation equals the direct formula on random tables") {
    forAllSeeded(tableGen, 6) { rows =>
      val got = Olap.mutualInformation(rows.toDF("x", "y"), "x", "y")
        .select("mi_nats").as[Double].head()
      val n = rows.size.toDouble
      val nxy = rows.groupBy(identity).view.mapValues(_.size).toMap
      val nx = rows.groupBy(_._1).view.mapValues(_.size).toMap
      val ny = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val want = nxy.map { case ((x, y), c) =>
        c / n * math.log(c * n / (nx(x).toDouble * ny(y)))
      }.sum
      assert(math.abs(got - want) < 1e-5, s"got $got want $want")
    }
  }

  test("chiSquare equals the direct formula including zero cells") {
    forAllSeeded(tableGen, 6) { rows =>
      val out = Olap.chiSquare(rows.toDF("x", "y"), "x", "y")
        .select("chi2", "cramers_v").as[(Double, Double)].head()
      val n = rows.size.toDouble
      val nxy = rows.groupBy(identity).view.mapValues(_.size).toMap
      val nx = rows.groupBy(_._1).view.mapValues(_.size).toMap
      val ny = rows.groupBy(_._2).view.mapValues(_.size).toMap
      // keys.toSeq, NOT keys: a for-comprehension over Sets yields a
      // SET of term values — cells with equal marginals produce equal
      // terms that silently dedup before .sum (found the hard way)
      val want = (for { x <- nx.keys.toSeq; y <- ny.keys.toSeq } yield {
        val e = nx(x).toDouble * ny(y) / n
        val o = nxy.getOrElse((x, y), 0).toDouble
        (o - e) * (o - e) / e
      }).sum
      assert(math.abs(out._1 - want) < 1e-5, s"got ${out._1} want $want")
      val vWant = math.sqrt(
        out._1 / (n * (math.min(nx.size, ny.size) - 1)))
      assert(math.abs(out._2 - vWant) < 1e-5)
    }
  }
}
