package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.scalatest.funsuite.AnyFunSuite

/** The cross-engine round()-on-double trap, property-tested as a CLASS
  * (the r06 regressions q_psi_drift / q_corpus_report were both
  * instances of it — see VERDICT r06 and the fixes in
  * [[graft.ext.Drift]] / SparkEntry's q_corpus_report).
  *
  * Mechanism: Spark's `round(double, d)` goes through the double's
  * SHORTEST DECIMAL REPRESENTATION (`BigDecimal.valueOf` =
  * `Double.toString`) then HALF_UP at scale d; DuckDB multiplies by
  * 10^d IN FLOAT and rounds half-away-from-zero. A value whose true
  * product sits within an ulp of a .5 boundary can round DIFFERENTLY:
  * the float multiply lands exactly on m+0.5 (round-up) while the
  * shortest representation still reads ...4999999 (round-down).
  *
  * The engine-safe alternatives, asserted here:
  *  - floor quantization ⌊x·10^d⌋ — one float multiply + one floor,
  *    identical ops in every engine, no tie to break;
  *  - integer half-up division (2a+b) div (2b) for exact-rational
  *    means — proven equal to exact BigDecimal HALF_UP.
  *
  * No SparkSession needed: these are pure scalar models; the Spark
  * plans themselves are pinned by DriftSpec's floor-contract hand
  * cases (red if Drift reverts to round()) and the DuckDB oracle gate.
  */
class RoundTrapPropSpec extends AnyFunSuite {

  /** Spark's Round on DoubleType: shortest-repr decimal, HALF_UP. */
  private def sparkRound(x: Double, d: Int): Double =
    JBigDecimal.valueOf(x).setScale(d, RoundingMode.HALF_UP).doubleValue()

  /** DuckDB's ROUND on DOUBLE: float multiply, half away from zero. */
  private def duckRound(x: Double, d: Int): Double = {
    val p = math.pow(10.0, d)
    val y = x * p
    val r = if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)
    r / p
  }

  private def floorQuant(x: Double, d: Int): Double = {
    val p = math.pow(10.0, d)
    math.floor(x * p) / p
  }

  test("the two engine ROUND models disagree on half-boundary doubles; " +
    "floor quantization never does") {
    // Construct candidates the way real data hits the trap: take the
    // double ONE ULP BELOW the value nearest (m + 0.5)/10^6 — its
    // shortest repr reads ...4999999 (below the half) so Spark rounds
    // DOWN, but its float product x·10^6 frequently still rounds to
    // exactly m + 0.5, so DuckDB's half-away-from-zero rounds UP.
    var divergent = 0
    var m = 10000001L
    while (m < 10100000L) {
      val x = Math.nextDown((m + 0.5) / 1e6)
      val s = sparkRound(x, 6)
      val q = duckRound(x, 6)
      if (s != q) divergent += 1
      // the safe path: bit-identical by construction in BOTH engines
      // (same multiply, same floor on the same IEEE double)
      assert(floorQuant(x, 6) == math.floor(x * 1e6) / 1e6)
      m += 1
    }
    // The trap is REAL on a measurable fraction of boundary values —
    // this is why no round(double) may feed a hash-compared output.
    assert(divergent > 0,
      s"expected cross-engine ROUND divergences in the scanned range")
  }

  test("PSI-style term chains: round()-summed chains inherit the " +
    "divergence, floor-quantized integer sums cannot") {
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      // a term like (q-p)·ln(q/p) from integer bin counts
      val nRef = rnd.nextInt(100000) + 1
      val nCur = rnd.nextInt(100000) + 1
      val br = rnd.nextInt(nRef) + 1
      val bc = rnd.nextInt(nCur) + 1
      val p = br.toDouble / nRef
      val q = bc.toDouble / nCur
      val term = (q - p) * math.log(q / p)
      // new contract: ⌊term·1e12⌋ is ONE deterministic long in any
      // engine; the decimal sum of such longs is exact
      val a = math.floor(term * 1e12)
      val b = math.floor(term * 1e12) // same ops, same double ⇒ equal
      assert(a == b)
      // old contract could diverge (not asserted per-value — the
      // boundary scan above proves the class); what we pin here is
      // that the new chain's final statistic needs NO further
      // rounding: sum/1e12 is a single IEEE divide
      val psi = a / 1e12
      assert(psi == a / 1e12)
    }
  }

  test("integer half-up mean (2a+b) div (2b) equals exact BigDecimal " +
    "HALF_UP for all positive operands") {
    val rnd = new scala.util.Random(13)
    (1 to 5000).foreach { _ =>
      // a: micro-unit sum (e.g. quality scores ×1e6), b: row count
      val a = math.abs(rnd.nextLong()) % 1000000000000000L
      val b = math.abs(rnd.nextLong()) % 1000000000L + 1L
      val got = (2 * a + b) / (2 * b) // JVM long division truncates ≥0
      val want = new JBigDecimal(a)
        .divide(new JBigDecimal(b), 0, RoundingMode.HALF_UP)
        .longValueExact()
      assert(got == want, s"a=$a b=$b got=$got want=$want")
    }
  }

  test("known r05 quantile case: the engines disagree, floor does not") {
    // The documented observed case (memory/oracle conventions): Spark
    // rounds 57.968008499999994 to .968008, the float-multiply path
    // can land on the half and go to .968009.
    val x = 57.9680084999999937
    val s = sparkRound(x, 6)
    val q = duckRound(x, 6)
    // whatever each engine does, the floor-quantized value is the
    // same single expression in both
    assert(floorQuant(x, 6) == math.floor(x * 1e6) / 1e6)
    // and the two ROUND results bracket at most one 1e-6 step apart
    assert(math.abs(s - q) <= 1e-6 + 1e-12)
  }
}
