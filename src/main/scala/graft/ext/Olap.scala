package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Warehouse-style OLAP operators over the star schema: grouping
  * sets (rollup), pivot, exact column profiling, and fixed-width
  * histograms. No reference equivalent (north-star extension per
  * BASELINE.json) — these are the reporting queries a curation team
  * runs against the same tables the pipeline maintains.
  *
  * Scale notes (100 TB):
  *   - rollup/cube compile to ONE Expand + hash aggregate pass — Spark
  *     never re-scans the fact table per grouping set;
  *   - pivot with pinned values is a single hash aggregate whose value
  *     list is fixed at plan time (no collect-distinct pre-pass);
  *   - profiling runs as one aggregate job; multiple exact
  *     count-distincts share one Expand pass (rows × #distinct-aggs —
  *     the documented cost; swap in approx_count_distinct when 2%
  *     error is acceptable and the Expand multiplier hurts);
  *   - histogram is a projection + hash aggregate on the bin id: fully
  *     partial-aggregatable, shuffle carries ≤ #bins rows per task.
  */
object Olap {

  /** Decimal-exact double sum: partial-aggregation order cannot change
    * the result (same rationale as `q_revenue_monthly`).
    */
  private def exactSum(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  /** ROLLUP over `groupCols` with an exact sum and a row count.
    * `gid` is the standard SQL GROUPING() bit-vector (0 = most
    * detailed level), identical to DuckDB's `GROUPING(a, b, ...)`.
    */
  def rollupSum(
      df: DataFrame, groupCols: Seq[String], sumCol: String): DataFrame =
    df.rollup(groupCols.map(col): _*)
      .agg(
        grouping_id().as("gid"),
        exactSum(col(sumCol)).as("sum_val"),
        count(lit(1)).as("cnt"))

  /** CUBE over `groupCols` — all 2^n grouping sets, still ONE Expand +
    * one hash aggregate pass (the Expand multiplier is 2^n, the
    * documented cost; keep n small).
    */
  def cubeSum(
      df: DataFrame, groupCols: Seq[String], sumCol: String): DataFrame =
    df.cube(groupCols.map(col): _*)
      .agg(
        grouping_id().as("gid"),
        exactSum(col(sumCol)).as("sum_val"),
        count(lit(1)).as("cnt"))

  /** Pivot `pivotCol` over the pinned `values` (no collect-distinct
    * pre-pass — the value list is part of the query contract), exact
    * sum of `sumCol` per (`keyCol`, value). Output columns are
    * `keyCol, sum_<value.toLowerCase>...` in `values` order.
    */
  def pivotSum(
      df: DataFrame, keyCol: Column, keyName: String,
      pivotCol: String, values: Seq[String], sumCol: String): DataFrame = {
    val pivoted = df
      .groupBy(keyCol.as(keyName))
      .pivot(pivotCol, values)
      .agg(exactSum(col(sumCol)))
    values.foldLeft(pivoted) { (acc, v) =>
      acc.withColumnRenamed(v, s"sum_${v.toLowerCase}")
    }
  }

  /** Per-column formatting spec for [[profile]]: how a column's
    * min/max are rendered to the common string type. Fixed formats —
    * never engine-default float rendering — so the profile is
    * cross-engine comparable.
    */
  sealed trait ColKind
  case object AsString extends ColKind
  case object AsLong extends ColKind
  /** `%.4f` fixed rendering. */
  case object AsDouble extends ColKind
  /** Microsecond-precision timestamp rendering. */
  case object AsTimestamp extends ColKind

  private def render(c: Column, kind: ColKind): Column = kind match {
    case AsString => c
    case AsLong => c.cast("string")
    // round() first, then format: Java's %.4f rounds HALF_UP while C
    // printf (DuckDB et al.) rounds half-to-even, so a value landing
    // exactly on a binary-representable half (0.0625-style) renders
    // differently across engines. round(c, 4) resolves the half-way
    // case identically on both sides (away-from-zero in Spark and
    // DuckDB), after which the formatter sees a value ~1 ulp from a
    // 4-decimal point — no half-way ambiguity left to disagree on.
    case AsDouble => format_string("%.4f", round(c, 4))
    case AsTimestamp => date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
  }

  /** Exact data-profile of the listed columns: one row per column with
    * null count, exact distinct count, and formatted min/max. One
    * aggregate job; the multi-distinct Expand is the documented cost.
    */
  def profile(df: DataFrame, cols: Seq[(String, ColKind)]): DataFrame = {
    val aggs = cols.flatMap { case (name, kind) =>
      Seq(
        count(lit(1)).minus(count(col(name))).as(s"__nulls_$name"),
        countDistinct(col(name)).as(s"__ndv_$name"),
        // min/max on the NATIVE type, rendered after — string-min of a
        // formatted number would order "9" above "14".
        render(min(col(name)), kind).as(s"__min_$name"),
        render(max(col(name)), kind).as(s"__max_$name"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.map { case (name, _) =>
      struct(
        lit(name).as("col_name"),
        col(s"__nulls_$name").as("n_nulls"),
        col(s"__ndv_$name").as("n_distinct"),
        col(s"__min_$name").as("min_val"),
        col(s"__max_$name").as("max_val"))
    }: _*)
    one.select(explode(rows).as("p")).select("p.*")
  }

  /** Fixed-width histogram of `valCol` with bin width `width` starting
    * at 0. The bin id is `floor(v / width)` — with a power-of-two
    * width the division is an exact binary scaling, so bin assignment
    * is bit-identical across engines (no 0.1-style decimal-width ulp
    * traps). Rows with null `valCol` are dropped.
    */
  def histogram(df: DataFrame, valCol: String, width: Long): DataFrame =
    df.filter(col(valCol).isNotNull)
      .groupBy(floor(col(valCol) / lit(width.toDouble)).cast("long").as("bin"))
      .agg(
        count(lit(1)).as("cnt"),
        exactSum(col(valCol)).as("sum_val"))
      .withColumn("bin_lo", (col("bin") * lit(width)).cast("double"))
}
