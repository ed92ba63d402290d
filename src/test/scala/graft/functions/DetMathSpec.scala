package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[DetMath.lnq]] is the determinism kernel under every
  * floor-quantized log in the drift/entropy/MI family — these specs
  * pin (a) bit-equality between the Column form and the scalar
  * reference model (the same property the DuckDB oracle mirror
  * relies on), (b) the exact special values the JSD dummy-input
  * guard depends on, and (c) accuracy against libm far below the
  * 12-dp quantization grid.
  */
class DetMathSpec extends SparkSpec {
  import spark.implicits._

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  test("lnq(1) is exactly 0 and powers of two are exactly k*ln2") {
    assert(bits(DetMath.lnqDouble(1.0)) == bits(0.0))
    for (k <- -60 to 60 if k != 0) {
      val x = math.pow(2.0, k.toDouble)
      assert(bits(DetMath.lnqDouble(x)) == bits(k.toDouble * DetMath.Ln2),
        s"2^$k")
    }
  }

  test("Column lnq is bit-identical to the scalar model across a " +
    "wide-exponent sweep") {
    val xs = (1 to 20000).flatMap { i =>
      Seq(
        i.toDouble / 7919.0,            // ratio-of-counts shapes
        1e-6 * i,                        // eps-scaled psi inputs
        i.toDouble / 19997.0 / 1e-6,     // large ratios
        math.pow(2.0, (i % 120 - 60).toDouble) * (1.0 + i / 1e8))
    }.filter(_ > 0)
    // the TREE pin proves the SQL-chain mirror ≡ scalar; the lnq
    // (expression-node) pin proves queries compute the same thing
    val got = xs.toDF("x")
      .select(col("x"), DetMath.lnqTree(col("x")).as("tree"),
        DetMath.lnq(col("x")).as("lnx"))
      .as[(Double, Double, Double)].collect()
    got.foreach { case (x, tree, lnx) =>
      assert(bits(tree) == bits(DetMath.lnqDouble(x)), s"tree x=$x")
      assert(bits(lnx) == bits(DetMath.lnqDouble(x)), s"x=$x")
    }
  }

  test("lnq tracks libm log within 5e-13 absolute over [1e-12, 1e12]") {
    var worst = 0.0
    (1 to 100000).foreach { i =>
      val x = math.exp((i % 55300) / 1000.0 - 27.6) // ~e^-27.6 .. e^27.6
      val err = math.abs(DetMath.lnqDouble(x) - math.log(x))
      if (err > worst) worst = err
    }
    assert(worst < 5e-13, s"worst=$worst")
  }

  test("expq(0) is exactly 1 and integer multiples of ln2 are exact " +
    "powers of two") {
    assert(bits(DetMath.expqDouble(0.0)) == bits(1.0))
    for (k <- -60 to 60) {
      val got = DetMath.expqDouble(k.toDouble * DetMath.Ln2)
      // r = k*ln2 - k*ln2 = 0 exactly -> s = 1 -> 2^k exactly
      assert(bits(got) == bits(math.pow(2.0, k.toDouble)), s"k=$k")
    }
  }

  test("Column expq is bit-identical to the scalar model across " +
    "surprisal/score-shaped inputs") {
    val xs = (1 to 20000).flatMap { i =>
      Seq(
        i.toDouble / 1000.0,            // surprisal range [0, 20]
        -i.toDouble / 2000.0,           // negative scores
        i.toDouble / 7919.0 - 1.3,      // straddling zero
        (i % 1400).toDouble / 2.0 - 350.0)  // wide-exponent sweep
    }
    val got = xs.toDF("x")
      .select(col("x"), DetMath.expqTree(col("x")).as("tree"),
        DetMath.expq(col("x")).as("ex"))
      .as[(Double, Double, Double)].collect()
    got.foreach { case (x, tree, ex) =>
      assert(bits(tree) == bits(DetMath.expqDouble(x)), s"tree x=$x")
      assert(bits(ex) == bits(DetMath.expqDouble(x)), s"x=$x")
    }
  }

  test("expq tracks libm exp within 1e-13 relative and inverts lnq " +
    "to ~1e-12") {
    (1 to 5000).foreach { i =>
      val x = i.toDouble / 250.0 - 10.0  // [-10, 10]
      val e = DetMath.expqDouble(x)
      assert(math.abs(e - math.exp(x)) / math.exp(x) < 1e-13, s"x=$x")
    }
    (1 to 5000).foreach { i =>
      val x = i.toDouble / 3.7
      val rt = DetMath.expqDouble(DetMath.lnqDouble(x))
      assert(math.abs(rt - x) / x < 1e-12, s"x=$x")
    }
  }

  test("Column lnRatioFp equals the BigInt scalar model on " +
    "count-ratio-shaped inputs") {
    val pairs = ((1 to 3000).map { i =>
      val a = 1L + (i.toLong * 2654435761L) % 999999937L
      val b = 1L + (i.toLong * 40503L) % (a)
      (a max b, a min b)
    } ++ Seq(
      (1L, 1L), (2L, 1L), (3L, 2L), (1000000L, 1L),
      (999999999999L, 1L), (1L << 60, 1L), (1L << 60, (1L << 60) - 1),
      ((1L << 60) + 12345L, 977L))).distinct
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        DetMath.lnRatioFp(col("a"), col("b")).cast("string").as("fp"))
      .as[(Long, Long, String)].collect()
    got.foreach { case (a, b, fp) =>
      assert(BigInt(fp) == DetMath.lnRatioFpBig(a, b), s"a=$a b=$b")
    }
  }

  test("lnRatioFp tracks libm log within 1e-12 relative-to-Q and is " +
    "exactly 0 at a=b") {
    assert(DetMath.lnRatioFpBig(7L, 7L) == 0)
    var worst = 0.0
    (1 to 20000).foreach { i =>
      val a = 1L + (i.toLong * 2654435761L) % 999999937L
      val b = 1L + (i.toLong * 48271L) % a
      val fp = DetMath.lnRatioFpBig(a max b, a min b)
      val err = math.abs(fp.toDouble / 1e18 -
        math.log((a max b).toDouble / (a min b).toDouble))
      if (err > worst) worst = err
    }
    assert(worst < 1e-12, s"worst=$worst")
  }
}
