package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Exact Pearson correlation matrix over the listed numeric columns:
    * one row per unordered pair (col_a < col_b in list order) with the
    * 6-dp-rounded coefficient.
    *
    * NOT `corr()`: both engines' built-ins accumulate running double
    * moments whose value depends on partition order. Here every input
    * to the closed form
    *   r = (n·Σxy − Σx·Σy) / √((n·Σxx − (Σx)²)(n·Σyy − (Σy)²))
    * is a DECIMAL-exact sum (the q_revenue_monthly/zscore convention),
    * so the double formula — and the rounded coefficient — is
    * bit-identical cross-engine and under any partitioning.
    *
    * One aggregate job over one scan: n + |cols| sums + |cols|·(|cols|
    * +1)/2 product sums, all map-side combinable. Rows with a null in
    * ANY listed column are dropped (one consistent n for every pair —
    * pairwise-complete deletion would give each pair its own n).
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlation needs at least two columns")
    val clean = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
    def dec(c: String) = col(c).cast("decimal(18,6)")
    val pairs = for {
      i <- cols.indices; j <- i until cols.size
    } yield (i, j)
    val aggs = (count(lit(1)).as("__n") +:
      cols.map(c => sum(dec(c)).cast("double").as(s"__s_$c"))) ++
      pairs.map { case (i, j) =>
        sum(dec(cols(i)) * dec(cols(j))).cast("double").as(s"__p_${i}_$j")
      }
    val one = clean.agg(aggs.head, aggs.tail: _*)
    def p(i: Int, j: Int) = col(s"__p_${i}_$j")
    def s(i: Int) = col(s"__s_${cols(i)}")
    val n = col("__n")
    val rows = array((for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield struct(
      lit(cols(i)).as("col_a"),
      lit(cols(j)).as("col_b"),
      round((n * p(i, j) - s(i) * s(j)) /
        sqrt((n * p(i, i) - s(i) * s(i)) * (n * p(j, j) - s(j) * s(j))), 6)
        .as("corr"))): _*)
    one.select(explode(rows).as("r")).select("r.*")
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

  /** Per-group Shannon entropy of a categorical column, in nats — the
    * diversity number for the dataset card: per source, how varied are
    * its languages/labels? H = 0 ⇒ monoculture, H = ln(n_cats) ⇒
    * uniform. Output per group: (groupCols..., n, n_cats, entropy).
    *
    * Determinism: probabilities are exact integer-count ratios; the
    * log is [[graft.functions.DetMath.lnq]] (bit-identical
    * cross-engine, unlike libm log's 1-ulp wobble); each category
    * term is floor-quantized (⌊x·10¹²⌋ — tie-free, unlike
    * round()-on-double whose half-boundary tie-break is
    * engine-specific) and summed as exact DECIMAL integers
    * ([[mutualInformation]]'s discipline); the entropy is the integer
    * sum ÷ 10¹².
    *
    * Scale shape: one (group, category)-keyed count (map-side
    * combinable), group totals as a sum-window over that cell frame
    * (never re-scanning the stream), one aggregate down to a row per
    * group.
    */
  def categoricalEntropy(
      df: DataFrame, groupCols: Seq[String], catCol: String): DataFrame = {
    require(groupCols.nonEmpty, "categoricalEntropy needs group columns")
    val gs = groupCols.map(col)
    val cells = df
      .groupBy(gs :+ col(catCol).as("__cat"): _*)
      .agg(count(lit(1)).as("__nc"))
    val byGroup = Window.partitionBy(gs: _*)
    val p = col("__nc").cast("double") / col("__n").cast("double")
    val term = floor(-p * graft.functions.DetMath.lnq(p) * lit(1e12))
      .cast("decimal(20,0)")
    cells
      .withColumn("__n", sum(col("__nc")).over(byGroup))
      .groupBy(gs: _*)
      .agg(
        max(col("__n")).as("n"),
        count(lit(1)).as("n_cats"),
        (sum(term).cast("double") / lit(1e12)).as("entropy_nats"))
  }

  /** Pearson chi-square independence statistic over two categorical
    * columns — [[mutualInformation]]'s hypothesis-test sibling: MI
    * measures HOW MUCH dependence (nats), χ² with its degrees of
    * freedom says whether the dependence is bigger than chance at this
    * sample size. Output one row: (n, n_cells, dof, chi2), dof =
    * (|X|−1)·(|Y|−1) over the OBSERVED levels.
    *
    * Determinism: [[mutualInformation]]'s discipline — exact integer
    * counts, double terms floor-quantized (⌊x·10¹²⌋, tie-free), exact
    * DECIMAL integer sum, chi2 = sum ÷ 10¹². Unlike MI (where empty cells contribute exactly 0), a
    * ZERO-observed cell still contributes its (0−E)²/E mass, so the
    * terms run over the full marginal grid: the bounded |X|-row ×
    * |Y|-row marginal frames cross-join (≤ |X|·|Y| rows) and
    * left-join the observed cells — never a window, never a second
    * scan of the stream. n_cells reports the FULL grid size.
    */
  def chiSquare(
      df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df
      .groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__nxy"))
    val xs = cells.groupBy(col("__x")).agg(sum(col("__nxy")).as("__nx"))
    val ys = cells.groupBy(col("__y")).agg(sum(col("__nxy")).as("__ny"))
    // Null levels are REAL levels — [[mutualInformation]]'s convention.
    // The grid join is null-safe (<=>, via re-aliased cell keys so the
    // shared-lineage attributes can't collapse to a trivially-true
    // condition) and kx/ky count marginal ROWS: countDistinct would
    // drop a null level while its counts stayed in n and the opposing
    // marginals, inflating chi2 with spurious (0−E)²/E mass and
    // understating dof.
    val cellsK = cells.select(
      col("__x").as("__cx"), col("__y").as("__cy"), col("__nxy"))
    val grid = xs.crossJoin(ys)
      .join(cellsK,
        col("__x") <=> col("__cx") && col("__y") <=> col("__cy"), "left")
      .withColumn("__o", coalesce(col("__nxy"), lit(0L)))
    val totals = cells.agg(sum(col("__nxy")).as("n"))
      .crossJoin(xs.agg(count(lit(1)).as("__kx")))
      .crossJoin(ys.agg(count(lit(1)).as("__ky")))
    val expected = col("__nx").cast("double") * col("__ny").cast("double") /
      col("n").cast("double")
    val term = floor(
      (col("__o").cast("double") - expected) *
        (col("__o").cast("double") - expected) / expected
        * lit(1e12)).cast("decimal(20,0)")
    grid.crossJoin(broadcast(totals))
      .groupBy(col("n"),
        (col("__kx") * col("__ky")).as("n_cells"),
        ((col("__kx") - 1) * (col("__ky") - 1)).as("dof"),
        least(col("__kx"), col("__ky")).as("__kmin"))
      .agg((sum(term).cast("double") / lit(1e12)).as("chi2"))
      // Cramér's V = √(χ²/(n·(min(k)−1))) ∈ [0,1]: the effect size
      // that stays comparable across table shapes and sample sizes
      // (χ² itself grows with n). Degenerate 1-level tables ⇒ null.
      // Floor-quantized to 6 dp — same tie-free contract as chi2.
      .withColumn("cramers_v",
        when(col("__kmin") > 1,
          floor(sqrt(col("chi2") /
            (col("n").cast("double") * (col("__kmin") - 1).cast("double")))
            * lit(1e6)).cast("double") / lit(1e6)))
      .select(col("n"), col("n_cells"), col("dof"), col("chi2"),
        col("cramers_v"))
  }

  /** Mutual information between two categorical columns, in nats:
    *   I(X;Y) = Σ_xy p(xy) · ln( p(xy) / (p(x)·p(y)) )
    * The feature-redundancy / leakage detector: I ≈ 0 ⇒ independent
    * (a candidate feature adds signal), I ≈ min(H(X),H(Y)) ⇒ one
    * column is a function of the other (drop it, or it's leaking the
    * label). Output one row: (n, n_cells, mi_nats).
    *
    * Determinism: every probability is a ratio of exact integer
    * counts; the log-ratio is [[graft.functions.DetMath.lnq]]
    * (bit-identical cross-engine); each cell's term is computed in
    * double from those integers identically in any engine,
    * floor-quantized (⌊x·10¹²⌋ — tie-free, engine-exact), and summed
    * as exact DECIMAL integers — the [[graft.ext.Drift.psi]]
    * discipline — then ÷ 10¹².
    *
    * Scale shape: one (x,y)-keyed count aggregate (map-side
    * combinable; cell count bounded by |X|·|Y|, not rows), marginals
    * as two sum-windows OVER THE CELL FRAME (never re-scanning the
    * stream), one-row output. Null categories participate as their
    * own level — nullability is often the leak.
    */
  def mutualInformation(
      df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df
      .groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__nxy"))
    val byX = Window.partitionBy(col("__x"))
    val byY = Window.partitionBy(col("__y"))
    val withMargins = cells
      .withColumn("__nx", sum(col("__nxy")).over(byX))
      .withColumn("__ny", sum(col("__nxy")).over(byY))
    val totals = cells.agg(
      sum(col("__nxy")).as("n"), count(lit(1)).as("n_cells"))
    val term = floor(
      col("__nxy").cast("double") / col("n").cast("double") *
        graft.functions.DetMath.lnq(
          col("__nxy").cast("double") * col("n").cast("double") /
            (col("__nx").cast("double") * col("__ny").cast("double")))
        * lit(1e12)).cast("decimal(20,0)")
    withMargins.crossJoin(broadcast(totals))
      .groupBy(col("n"), col("n_cells"))
      .agg((sum(term).cast("double") / lit(1e12)).as("mi_nats"))
      .select(col("n"), col("n_cells"), col("mi_nats"))
  }

  /** Per-group Spearman rank correlation with midrank ties — the
    * monotone-association complement of [[correlationMatrix]]'s
    * Pearson: rank first, correlate second, so outliers and any
    * monotone nonlinearity stop distorting the coefficient.
    *
    * Exactness: each variable's midranks come from per-distinct-value
    * counts and a cumulative count within the group — and the DOUBLED
    * midrank 2·cumBefore + cnt + 1 is an exact INTEGER (the
    * [[graft.ext.Drift.mannWhitney]] device). Pearson is invariant
    * under the shared ×2 scaling, so all five moments (m, Σa, Σb,
    * Σa², Σb², Σab over doubled midranks) are exact DECIMAL sums; the
    * coefficient
    *
    *   ρ = (m·Σab − Σa·Σb) / √((m·Σa² − (Σa)²) · (m·Σb² − (Σb)²))
    *
    * is straight-line double arithmetic on exact values,
    * floor-quantized to 6 dp.
    *
    * Scale shape: two per-(group, value) count aggregates (map-side
    * combinable, distinct-value-bounded); rank maps attach back via
    * two (group, value)-keyed equi-joins; cumulative counts window
    * over the AGGREGATED per-value frame PARTITIONED BY GROUP (the
    * [[graft.ext.Vocab.bigramSurprisal]] convention — parallelism is
    * groups, state is one group's distinct values, never the row
    * stream and never a global sort).
    *
    * Output per group: (group…, n, rho); rho null when either
    * variable is constant within the group.
    */
  def spearman(
      df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val keys = groupCols.map(col)
    val rows = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(keys :+ col(xCol).as("__x") :+ col(yCol).as("__y"): _*)
    def rankMap(c: String, out: String): DataFrame = {
      val counts = rows.groupBy(keys :+ col(c): _*)
        .agg(count(lit(1)).as("__cnt"))
      val w = Window.partitionBy(keys: _*).orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      counts
        .withColumn("__cum", sum(col("__cnt")).over(w))
        .select(keys :+ col(c) :+
          (lit(2L) * (col("__cum") - col("__cnt")) + col("__cnt") + lit(1L))
            .cast("decimal(38,0)").as(out): _*)
    }
    val ranked = rows
      .join(rankMap("__x", "__ra"), groupCols :+ "__x")
      .join(rankMap("__y", "__rb"), groupCols :+ "__y")
    val m = col("__m").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = m * d("__sab") - d("__sa") * d("__sb")
    val den = sqrt((m * d("__saa") - d("__sa") * d("__sa")) *
      (m * d("__sbb") - d("__sb") * d("__sb")))
    ranked
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("__m"),
        sum(col("__ra")).as("__sa"),
        sum(col("__rb")).as("__sb"),
        sum(col("__ra") * col("__ra")).as("__saa"),
        sum(col("__rb") * col("__rb")).as("__sbb"),
        sum(col("__ra") * col("__rb")).as("__sab"))
      .select(keys :+ col("__m").as("n") :+
        when(m * d("__saa") - d("__sa") * d("__sa") > 0.0 &&
          m * d("__sbb") - d("__sb") * d("__sb") > 0.0,
          floor(num / den * lit(1e6)) / lit(1e6)).as("rho"): _*)
  }
}
