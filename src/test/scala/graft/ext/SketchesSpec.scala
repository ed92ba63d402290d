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

  test("countMin: estimates never under-count and are exact sans collisions") {
    // 3 keys, frequencies 50/30/20; width 256 >> 3 keys so collisions
    // within a hash row are possible but unlikely across ALL 4 rows.
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c"))
      .toDF("k")
    val sketch = Sketches.countMin(df, "k")
    val keys = Seq("a", "b", "c").toDF("k")
    val est = Sketches.countMinEstimate(sketch, keys, "k")
      .as[(String, Long)].collect().toMap
    assert(est("a") === 50L && est("b") === 30L && est("c") === 20L)
  }

  test("countMin: sketch size is bounded by depth*width, cells sum to depth*N") {
    val df = (1L to 1000L).map(i => i % 97).toDF("k")
    val sketch = Sketches.countMin(df, "k", depth = 4, width = 64).collect()
    assert(sketch.length <= 4 * 64)
    // every input row lands in exactly one bucket per hash row
    assert(sketch.map(_.getLong(2)).sum === 4L * 1000L)
  }

  test("countMin: partition-merge invariance (exact integer cells)") {
    val df = (1L to 2000L).map(i => i * 13 % 50).toDF("k")
    val one = Sketches.countMin(df.repartition(1), "k", 4, 64)
      .orderBy("row_i", "bucket").collect().toSeq
    val many = Sketches.countMin(df.repartition(16), "k", 4, 64)
      .orderBy("row_i", "bucket").collect().toSeq
    assert(one === many)
  }
}
