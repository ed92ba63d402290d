package graft.ext

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("approxDistinct small cardinality: linear-counting regime, tight") {
    val df = (1L to 100L).map(i => ("g", i)).toDF("g", "v")
    val est = Sketches.approxDistinct(df, Seq("g"), "v")
      .select("approx_distinct").as[Double].head()
    // n=100 << m=512: linear counting, sd ~ sqrt(m·(e^t−1−t))/n ≈ 3%
    assert(math.abs(est - 100.0) / 100.0 < 0.08, s"est=$est")
  }

  test("approxDistinct large cardinality: HLL regime within 3 sigma") {
    val df = (1L to 20000L).map(i => ("g", i)).toDF("g", "v")
    val est = Sketches.approxDistinct(df, Seq("g"), "v")
      .select("approx_distinct").as[Double].head()
    // sigma = 1.04/sqrt(512) = 4.6% -> 3 sigma = 13.8%
    assert(math.abs(est - 20000.0) / 20000.0 < 0.138, s"est=$est")
  }

  test("approxDistinct ignores duplicates and nulls; groups independent") {
    val dups = ((1L to 500L) ++ (1L to 500L)).map(i => ("a", Some(i))) ++
      Seq(("a", Option.empty[Long])) ++ (1L to 500L).map(i => ("b", Some(i)))
    val out = Sketches.approxDistinct(dups.toDF("g", "v"), Seq("g"), "v")
      .as[(String, Double)].collect().toMap
    // identical value sets -> identical sketches, duplicates invisible
    assert(out("a") === out("b"))
  }

  test("approxDistinct is partition-invariant (exact integer registers)") {
    val df = (1L to 5000L).map(i => ("g", i * 37 % 3000)).toDF("g", "v")
    val one = Sketches.approxDistinct(df.repartition(1), Seq("g"), "v")
      .select("approx_distinct").as[Double].head()
    val many = Sketches.approxDistinct(df.repartition(16), Seq("g"), "v")
      .select("approx_distinct").as[Double].head()
    assert(one === many)
  }
}
