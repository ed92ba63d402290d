package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property check of the FastSS completeness lemma behind
  * [[Dedup.editDistancePairs]]: on random small-alphabet corpora
  * (adversarial for deletion-neighborhood collisions — lots of equal
  * adjacent chars and distance-2 near-misses), the equi-join candidate
  * path must return EXACTLY the brute-force Levenshtein-1 pair set.
  */
class EditDistancePropSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  // strings over {a, b, c} of length 0..6: dense enough that every
  // edit relation (substitution, insertion, deletion, transposition
  // near-misses) appears in most samples
  private val corpusGen: Gen[List[String]] =
    Gen.listOfN(60, Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))

  test("editDistancePairs equals brute force on random adversarial corpora") {
    forAllSeeded(corpusGen, 8) { names =>
      val df = names.toDF("name")
      val fast = Dedup.editDistancePairs(df, "name")
        .as[(String, String, Int)].collect().toSet
      val n = df.select(col("name").as("a")).distinct()
      val brute = n
        .join(df.select(col("name").as("b")).distinct(), col("a") < col("b"))
        .withColumn("d", levenshtein(col("a"), col("b")))
        .filter(col("d") <= 1)
        .as[(String, String, Int)].collect().toSet
      assert(fast == brute, s"corpus: $names")
    }
  }
}
