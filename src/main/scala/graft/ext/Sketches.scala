package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Mergeable cardinality sketches. No reference equivalent
  * (north-star extension).
  *
  * At 100 TB, `COUNT(DISTINCT k)` is a full shuffle of every distinct
  * key; a HyperLogLog register table is 2^b longs per group, mergeable
  * with `max` — the only distinct-counter that survives both scale and
  * incremental maintenance (register tables from daily partitions merge
  * losslessly: max is associative, commutative, idempotent).
  *
  * This is a PORTABLE HLL: the hash is the md5-prefix convention
  * ([[Sampling]]'s gate), ranks are integer/string ops, and the
  * register summary Σ 2^(−M[j]) is accumulated as the exact integer
  * Σ 2^(52−M[j]) — so the whole sketch, not just the estimate, is
  * bit-identically reproducible in any engine with md5 (oracle-checked
  * in DuckDB). Engine-native HLLs (Spark's approx_count_distinct,
  * DuckDB's) use private hashes and are not cross-checkable.
  */
object Sketches {

  /** Per-group HyperLogLog distinct estimate with 2^b registers.
    *
    * Layout of the 60-bit md5-prefix hash: top `b` bits select the
    * register, the remaining 60−b bits w give the rank
    * ρ = (60−b) − bitlen(w) + 1 (all-zero w ⇒ maximal rank 60−b+1).
    * Registers are max-aggregated; the raw estimate is
    * α·m²/Σ2^(−M[j]) with the standard linear-counting fallback below
    * 2.5·m when empty registers remain (Flajolet et al. 2007).
    *
    * Determinism: the register summary is the exact integer
    * Σ 2^((60−b+1)−M[j]) (≤ m·2^(60−b+1), inside int64 for b ≥ 5), so
    * partial-aggregation order cannot perturb it; the float formula
    * runs once per group on exact integer inputs and is rounded to
    * 4 dp. bitlen is `length(bin(w))` — string length of the
    * no-leading-zeros binary rendering, identical in Spark and DuckDB.
    *
    * Scale shape: one (group, register)-keyed max aggregate (map-side
    * combinable — the pre-shuffle stream collapses to ≤ m rows per
    * group per task), then a one-row-per-group aggregate. Nothing
    * driver-side; estimates of a trillion keys shuffle 2^b longs per
    * group.
    */
  def approxDistinct(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      b: Int = 9): DataFrame = {
    require(b >= 5 && b <= 16, s"b in [5,16]: $b")
    val m = 1 << b // registers
    val wBits = 60 - b // rank-field width
    val maxRank = wBits + 1
    val h = graft.functions.HashExprs.md5Prefix60(col(valueCol).cast("string"))
    val bucket = expr(s"__h div ${1L << wBits}L")
    val w = expr(s"__h % ${1L << wBits}L")
    val rank = when(col("__w") === 0L, lit(maxRank))
      .otherwise(lit(maxRank) - length(bin(col("__w"))))
    val gs = groupCols.map(col)
    val regs = df
      .filter(col(valueCol).isNotNull)
      .withColumn("__h", h)
      .select(gs :+ bucket.as("__bucket") :+ w.as("__w"): _*)
      .withColumn("__rank", rank)
      .groupBy(gs :+ col("__bucket"): _*)
      .agg(max(col("__rank")).as("__M"))
    // Exact-integer register summary: 2^(-M) scaled by 2^maxRank.
    val term = expr(s"shiftleft(1L, $maxRank - __M)")
    // Flajolet's bias-correction constant is m-specific below m=128
    // (the asymptotic formula overshoots by a few percent at small m).
    val alpha = m match {
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    regs
      .groupBy(gs: _*)
      .agg(
        sum(term).as("__s_live"),
        count(lit(1)).as("__live"))
      // empty registers contribute 2^0 = 1 (scaled: 2^maxRank) each
      .withColumn("__S",
        col("__s_live") +
          (lit(m.toLong) - col("__live")) * lit(1L << maxRank))
      .withColumn("__V", lit(m.toLong) - col("__live"))
      .withColumn("__raw",
        lit(alpha * m.toDouble * m.toDouble) *
          lit(math.pow(2.0, maxRank)) / col("__S").cast("double"))
      .withColumn("approx_distinct",
        round(
          when(col("__raw") <= lit(2.5 * m) && col("__V") > 0,
            lit(m.toDouble) *
              log(lit(m.toDouble) / col("__V").cast("double")))
            .otherwise(col("__raw")), 4))
      .select(gs :+ col("approx_distinct"): _*)
  }

  /** Count-Min sketch table: `depth` hash rows × `width` buckets of
    * exact counter sums (Cormode & Muthukrishnan 2005) — the mergeable
    * frequency sketch: two sketch tables over disjoint partitions merge
    * by per-cell `sum` (associative/commutative), so daily sketches
    * roll up losslessly without re-reading the raw stream. Estimates
    * never under-count (every collision only ADDS), overshoot bounded
    * by ε·N with ε = e/width at confidence 1−(1/e)^depth.
    *
    * PORTABLE like [[approxDistinct]]: hash row `i` is the md5-prefix
    * convention over `i || ':' || key`, counters are exact integers —
    * the entire sketch is bit-identically reproducible in any engine
    * with md5 (oracle-checked in DuckDB). Output: (row_i, bucket, cnt).
    *
    * Scale shape: one explode (×depth) → hash aggregate keyed on
    * (row_i, bucket) — map-side combine collapses the pre-shuffle
    * stream to ≤ depth·width rows per task, so the shuffle carries the
    * sketch, never the keys. No driver state.
    */
  def countMin(
      df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth in [1,8]: $depth")
    require(width >= 2, s"width must be >= 2: $width")
    df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("__k"))
      .select(explode(array((0 until depth).map(lit): _*)).as("row_i"),
        col("__k"))
      .select(col("row_i"),
        (graft.functions.HashExprs.md5Prefix60(
          concat(col("row_i").cast("string"), lit(":"), col("__k")))
          % lit(width.toLong)).as("bucket"))
      .groupBy(col("row_i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch: each key's estimate is the MIN over the
    * `depth` hash rows of its bucket counter. `keys` carries the probe
    * keys in `keyCol` (plus any passenger columns, which survive);
    * the sketch side is ≤ depth·width rows and is broadcast — probing
    * never shuffles the sketch or the keys.
    */
  def countMinEstimate(
      sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    val passengers = keys.columns.map(col)
    val probes = keys
      .select(passengers :+
        explode(array((0 until depth).map(lit): _*)).as("row_i"): _*)
      .withColumn("bucket",
        graft.functions.HashExprs.md5Prefix60(
          concat(col("row_i").cast("string"), lit(":"),
            col(keyCol).cast("string"))) % lit(width.toLong))
    probes
      .join(broadcast(sketch), Seq("row_i", "bucket"))
      .groupBy(passengers: _*)
      .agg(min(col("cnt")).as("cms_estimate"))
  }
}
