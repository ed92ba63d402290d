package graft.ext

import graft.SparkSpec

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  /** BigInt reference model of ridgeFit2's Cramer chain (trunc-div). */
  private def model(
      pts: Seq[(Long, Long, Long)], lambda: Long): (Long, Long, Long) = {
    val n = BigInt(pts.size)
    val s1 = pts.map(p => BigInt(p._1)).sum
    val s2 = pts.map(p => BigInt(p._2)).sum
    val s11 = pts.map(p => BigInt(p._1) * p._1).sum + lambda
    val s12 = pts.map(p => BigInt(p._1) * p._2).sum
    val s22 = pts.map(p => BigInt(p._2) * p._2).sum + lambda
    val sy = pts.map(p => BigInt(p._3)).sum
    val s1y = pts.map(p => BigInt(p._1) * p._3).sum
    val s2y = pts.map(p => BigInt(p._2) * p._3).sum
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    // BigInt / truncates toward zero — the ridgeFit2 contract.
    ((det0 * 1000000 / det).toLong, (det1 * 1000000 / det).toLong,
      (det2 * 1000000 / det).toLong)
  }

  test("ridgeFit2 with lambda=0 recovers an exact linear relation") {
    // y = 3 + 2*x1 - x2 exactly, non-collinear features
    val pts = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 5L), (5L, 3L))
      .map { case (x1, x2) => (x1, x2, 3L + 2L * x1 - x2) }
    val out = Regression.ridgeFit2(
      pts.toDF("x1", "x2", "y"), "x1", "x2", "y", lambda = 0L)
      .selectExpr("w0_q", "w1_q", "w2_q")
      .as[(Long, Long, Long)].head()
    assert(out === ((3000000L, 2000000L, -1000000L)))
  }

  test("ridgeFit2 matches the BigInt Cramer model, lambda shrinks, " +
    "partition-invariant") {
    val pts = (0L until 40L).map { i =>
      (i % 13 + 1, (i * 7) % 11, ((i * 31) % 97) * 1000)
    }
    val df = pts.toDF("x1", "x2", "y")
    for (lam <- Seq(0L, 100L, 100000L)) {
      val got = Regression.ridgeFit2(df, "x1", "x2", "y", lam)
        .selectExpr("w0_q", "w1_q", "w2_q").as[(Long, Long, Long)].head()
      assert(got === model(pts, lam), s"lambda=$lam")
    }
    // heavy ridge shrinks the slope magnitudes
    val free = model(pts, 0L)
    val tight = model(pts, 10000000L)
    assert(math.abs(tight._2) <= math.abs(free._2))
    assert(math.abs(tight._3) <= math.abs(free._3))
    val got16 = Regression.ridgeFit2(df.repartition(16), "x1", "x2", "y", 0L)
      .selectExpr("w0_q", "w1_q", "w2_q").as[(Long, Long, Long)].head()
    assert(got16 === model(pts, 0L))
  }

  test("ridgeFit2 emits the /1e6 double renderings of the quantized " +
    "weights") {
    val pts = Seq((1L, 1L, 10L), (2L, 3L, 20L), (3L, 2L, 25L),
      (5L, 4L, 40L))
    val row = Regression.ridgeFit2(
      pts.toDF("x1", "x2", "y"), "x1", "x2", "y", 10L)
      .selectExpr("w0_q", "w0", "w1_q", "w1", "w2_q", "w2")
      .as[(Long, Double, Long, Double, Long, Double)].head()
    assert(row._2 === row._1 / 1e6)
    assert(row._4 === row._3 / 1e6)
    assert(row._6 === row._5 / 1e6)
  }

  test("ridgeEval2: perfect fit scores R2=1 and zero error; noisy fit " +
    "matches the BigInt model") {
    val exact = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 5L), (5L, 3L))
      .map { case (x1, x2) => (x1, x2, 3L + 2L * x1 - x2) }
    val out = Regression.ridgeEval2(
      exact.toDF("x1", "x2", "y"), "x1", "x2", "y", lambda = 0L)
      .selectExpr("n_rows", "mae_q", "max_abs_err_q", "r2_q")
      .as[(Long, Long, Long, Long)].head()
    assert(out === ((5L, 0L, 0L, 1000000L)))

    // noisy data: recompute the whole chain in BigInt
    val pts = (0L until 30L).map(i =>
      (i % 7 + 1, (i * 5) % 9, ((i * 31) % 23) * 10))
    val (w0, w1, w2) = {
      // reuse the fit model from the other spec via ridgeFit2 output
      val f = Regression.ridgeFit2(
        pts.toDF("x1", "x2", "y"), "x1", "x2", "y", 10L)
        .selectExpr("w0_q", "w1_q", "w2_q")
        .as[(Long, Long, Long)].head()
      (BigInt(f._1), BigInt(f._2), BigInt(f._3))
    }
    val errs = pts.map { case (x1, x2, y) =>
      w0 + w1 * x1 + w2 * x2 - BigInt(1000000L) * y
    }
    val yps = pts.map(p => BigInt(1000000L) * p._3)
    val n = BigInt(pts.size)
    val sae = errs.map(_.abs).sum
    val sse = errs.map(e => e * e).sum
    val sy = yps.sum
    val syy = yps.map(v => v * v).sum
    val sst = n * syy - sy * sy
    val got = Regression.ridgeEval2(
      pts.toDF("x1", "x2", "y"), "x1", "x2", "y", 10L)
      .selectExpr("n_rows", "mae_q", "max_abs_err_q", "r2_q")
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((pts.size.toLong, (sae / n).toLong,
      errs.map(_.abs).max.toLong,
      ((sst - n * sse) * 1000000 / sst).toLong)))
  }
}
