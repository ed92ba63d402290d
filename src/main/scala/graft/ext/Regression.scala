package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] In-engine model fitting via exact integer normal equations.
  * No reference equivalent (north-star extension): a curation pipeline
  * that SCORES documents eventually wants to FIT the scorer — e.g.
  * calibrate a cheap linear quality model on integer text features so
  * the next crawl can be gated without the expensive chain.
  *
  * Closed-form least squares, not gradient descent: for a
  * two-feature-plus-intercept model the normal-equation system is 3×3,
  * so the whole fit is ONE aggregate pass producing nine exact integer
  * moments (n, Σx₁, Σx₂, Σx₁², Σx₁x₂, Σx₂², Σy, Σx₁y, Σx₂y in
  * DECIMAL(38,0) — partition-order-free) followed by Cramer's rule on
  * the driver-side one-row frame. No iterations, no learning rate, no
  * float accumulation anywhere.
  *
  * Cross-engine exactness: determinants are fixed-order products/sums
  * of exact integers (DuckDB mirrors them in HUGEINT); weights are
  * emitted as `w_q = trunc(det_i·10⁶ / det)` — trunc-toward-zero
  * integer division, identical in both engines for either sign — so
  * every compared cell is an exact integer (plus its /1e6 double
  * rendering, an exact small decimal).
  *
  * Bounds: moment magnitudes must keep each cofactor product < 10³⁸
  * (DECIMAL(38,0)); with per-doc features ≤ 10³ and y_q ≤ 10⁶ that
  * holds to ~10⁹ documents. Beyond that, pre-scale y_q (the weights
  * scale linearly) — same contract style as
  * [[Vocab.sourceKlMatrix]]'s < 2⁵³ note.
  */
object Regression {

  /** Ridge fit of y_q ≈ w0 + w1·x1 + w2·x2 over integer columns.
    * `lambda` (≥ 0, integer) is added to the two feature diagonal
    * entries — intercept unpenalized, standard ridge convention.
    * Output: one row of exact integers
    * (n_docs, det sign audit, w0_q/w1_q/w2_q at 10⁶ quantization)
    * plus the /1e6 double renderings.
    */
  def ridgeFit2(
      df: DataFrame, x1Col: String, x2Col: String, yCol: String,
      lambda: Long = 0L): DataFrame = {
    require(lambda >= 0, s"lambda must be >= 0: $lambda")
    val dec = "decimal(38,0)"
    val x1 = col(x1Col).cast(dec)
    val x2 = col(x2Col).cast(dec)
    val y = col(yCol).cast(dec)
    val m = df.agg(
      count(lit(1)).cast(dec).as("__n"),
      sum(x1).as("__s1"), sum(x2).as("__s2"),
      sum(x1 * x1).as("__s11"), sum(x1 * x2).as("__s12"),
      sum(x2 * x2).as("__s22"),
      sum(y).as("__sy"), sum(x1 * y).as("__s1y"), sum(x2 * y).as("__s2y"))
    val lam = lit(lambda).cast(dec)
    val (n, s1, s2) = (col("__n"), col("__s1"), col("__s2"))
    val (s11, s12, s22) = (col("__s11") + lam, col("__s12"), col("__s22") + lam)
    val (sy, s1y, s2y) = (col("__sy"), col("__s1y"), col("__s2y"))
    // Cramer determinants — cofactor expansion along the first row,
    // FIXED evaluation order, mirrored verbatim in the oracle SQL.
    val det = n * (s11 * s22 - s12 * s12) -
      s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) -
      s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) -
      sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) -
      s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    def wq(detI: org.apache.spark.sql.Column) = {
      val num = detI * lit(1000000L).cast(dec)
      ((num - num % det) / det).cast("long")
    }
    m.select(
      col("__n").cast("long").as("n_rows"),
      wq(det0).as("w0_q"), wq(det1).as("w1_q"), wq(det2).as("w2_q"))
      .withColumn("w0", col("w0_q").cast("double") / lit(1e6))
      .withColumn("w1", col("w1_q").cast("double") / lit(1e6))
      .withColumn("w2", col("w2_q").cast("double") / lit(1e6))
  }

  /** Fit-quality evaluation of [[ridgeFit2]] — the summary a scorer
    * calibration reads before trusting the linear model: MAE and R²
    * of the quantized predictions against the integer targets, still
    * exact: pred·10⁶ = w0_q + w1_q·x1 + w2_q·x2 is an exact integer,
    * residuals are exact integers at the 10⁶ grid, and
    *   R²·10⁶ = trunc((SST′ − n·SSE)·10⁶ / SST′),
    *   SST′ = n·Σy′² − (Σy′)²  (y′ = 10⁶·y)
    * is all integer arithmetic. One scoring pass (fit broadcast in) +
    * one moment aggregate. Magnitude bound: n·SSE·10⁶ < 10³⁸ holds to
    * ~10⁵ rows at 10⁶-scale targets — pre-scale y beyond (the
    * [[Vocab.sourceKlMatrix]] contract style).
    *
    * Output: one row (n_rows, mae_q, mae, max_abs_err_q, r2_q, r2).
    */
  def ridgeEval2(
      df: DataFrame, x1Col: String, x2Col: String, yCol: String,
      lambda: Long = 0L): DataFrame = {
    val dec = "decimal(38,0)"
    val fit = ridgeFit2(df, x1Col, x2Col, yCol, lambda)
      .select(col("w0_q").cast(dec).as("__w0"),
        col("w1_q").cast(dec).as("__w1"),
        col("w2_q").cast(dec).as("__w2"))
    val scored = df.crossJoin(broadcast(fit))
      .withColumn("__err",
        col("__w0") + col("__w1") * col(x1Col).cast(dec) +
          col("__w2") * col(x2Col).cast(dec) -
          lit(1000000L).cast(dec) * col(yCol).cast(dec))
      .withColumn("__yp", lit(1000000L).cast(dec) * col(yCol).cast(dec))
    val m = scored.agg(
      count(lit(1)).cast(dec).as("__n"),
      sum(abs(col("__err"))).as("__sae"),
      max(abs(col("__err"))).cast(dec).as("__mx"),
      sum(col("__err") * col("__err")).as("__sse"),
      sum(col("__yp")).as("__sy"),
      sum(col("__yp") * col("__yp")).as("__syy"))
    def truncDiv(a: org.apache.spark.sql.Column,
        d: org.apache.spark.sql.Column) = ((a - a % d) / d).cast("long")
    val sst = col("__n") * col("__syy") - col("__sy") * col("__sy")
    val r2num = (sst - col("__n") * col("__sse")) * lit(1000000L).cast(dec)
    m.select(
      col("__n").cast("long").as("n_rows"),
      truncDiv(col("__sae"), col("__n")).as("mae_q"),
      col("__mx").cast("long").as("max_abs_err_q"),
      truncDiv(r2num, sst).as("r2_q"))
      .withColumn("mae", col("mae_q").cast("double") / lit(1e6))
      .withColumn("r2", col("r2_q").cast("double") / lit(1e6))
  }
}
