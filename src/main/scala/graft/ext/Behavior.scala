package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] User-behavior analytics over the event stream: retention
  * cohorts and ordered funnels. No reference equivalent (north-star
  * extension per BASELINE.json).
  *
  * Scale notes (100 TB):
  *   - retention is ONE shuffle on the user key: the cohort assignment
  *     is a window-min over the same hash partitioning the final
  *     aggregate reuses — no second scan, no join back to the raw
  *     events;
  *   - the funnel folds into one aggregate per stage, each joined on
  *     the user key; after the first shuffle every stage join is
  *     co-partitioned (and the per-stage aggregates shrink
  *     monotonically, so AQE broadcasts the later ones).
  */
object Behavior {

  /** Weekly retention cohorts: users are cohorted by the ISO week of
    * their first event; each (cohort_week, week_offset) cell counts
    * the distinct users of that cohort active in that week.
    *
    * Both sides of the offset subtraction are week-truncated, so the
    * day difference is an exact multiple of 7 and the integer division
    * is lossless.
    */
  def retentionWeekly(
      df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    df
      .withColumn("__cohort",
        to_date(date_trunc("week", min(col(tsCol)).over(w))))
      .withColumn("__week",
        to_date(date_trunc("week", col(tsCol))))
      .groupBy(
        col("__cohort").as("cohort_week"),
        (datediff(col("__week"), col("__cohort")) / 7)
          .cast("long").as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Ordered funnel: for each user, stage i counts only if it has an
    * event STRICTLY after the user's stage i-1 time (sequential-min
    * semantics — a purchase logged before the first view does not
    * convert). Returns one row per stage:
    * (stage_ord, stage_name, n_users).
    */
  def funnel(
      df: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = df.sparkSession
    import spark.implicits._

    val head = df.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    val perUser = steps.zipWithIndex.tail.foldLeft(head) {
      case (acc, (step, i)) =>
        val stage = df.filter(col(typeCol) === step)
          .join(acc.select(col(userCol), col(s"t${i - 1}")), userCol)
          .filter(col(tsCol) > col(s"t${i - 1}"))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t$i"))
        acc.join(stage, Seq(userCol), "left")
    }
    val counts = perUser.agg(
      count(lit(1)).as("c0"),
      steps.indices.tail.map(i => count(col(s"t$i")).as(s"c$i")): _*)
    val stageRows = array(steps.zipWithIndex.map { case (step, i) =>
      struct(
        lit(i + 1).cast("long").as("stage_ord"),
        lit(step).as("stage_name"),
        col(s"c$i").as("n_users"))
    }: _*)
    counts.select(explode(stageRows).as("s")).select("s.*")
  }

  /** Top user-journey prefixes: each user's first `depth` events in
    * (ts, id) order become a " > "-joined path string; paths are
    * counted and the `k` most common returned — the product-analytics
    * "where do users actually go first?" table, and a behavioral
    * fingerprint for bot-cohort detection (scripted accounts share one
    * path; organic ones spread).
    *
    * Scale shape: the per-user prefix is a row_number rank filter —
    * WindowGroupLimit prunes to ≤ depth rows per user on BOTH sides of
    * the user shuffle ([[graft.ext.Analytics.topKPerGroup]]'s plan);
    * the ordered path assembles via a rank pivot in one user-keyed
    * aggregate (no collect_list ordering hazards — collect_list order
    * is partition-dependent); path counts are bounded by |types|^depth
    * keys; the final top-k is orderBy.limit → TakeOrderedAndProject.
    * Ties on (ts) break by `idCol` — total order, engine-stable.
    */
  def topPaths(
      df: DataFrame, userCol: String, typeCol: String, tsCol: String,
      idCol: String, depth: Int, k: Int): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth in [1,8]: $depth")
    require(k >= 1, s"k must be >= 1: $k")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val steps = (1 to depth).map(i =>
      max(when(col("__r") === i, col(typeCol))).as(s"__s$i"))
    df
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= depth)
      .groupBy(col(userCol))
      .agg(steps.head, steps.tail: _*)
      .groupBy(concat_ws(" > ",
        (1 to depth).map(i => col(s"__s$i")): _*).as("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(k)
  }

  /** Two-proportion conversion z-test between variants — the
    * experimentation primitive: did variant B's conversion rate move,
    * and is the move bigger than chance? Input is the raw event
    * stream plus a variant column (e.g. the deterministic hash gate
    * [[graft.ext.Sampling.splitAssign]] produces); a user converts if
    * ANY of their rows satisfies the `conversion` predicate (a Column,
    * so "purchase over $150" is as easy as "purchase"). Output one row
    * for the variant pair (first two variants in lexicographic order):
    * (variant_a, n_a, conv_a, rate_a, variant_b, n_b, conv_b, rate_b,
    * z_score), z from the pooled-proportion normal approximation.
    *
    * Determinism: all counts are exact integers; rates and z are a
    * fixed double formula over them (identical cross-engine), rounded
    * to 6 dp. Scale shape: one user-keyed aggregate (converted =
    * max(is-conversion) — map-side combinable), one variant-keyed
    * count aggregate (≤ |variants| rows), driver-free pivot of the
    * two variant rows via a self-join on the one-row frames.
    */
  def conversionZTest(
      df: DataFrame, userCol: String, variantCol: String,
      conversion: Column): DataFrame = {
    val perUser = df
      .groupBy(col(variantCol).as("__variant"), col(userCol))
      .agg(max(when(conversion, 1L).otherwise(0L)).as("__conv"))
    val perVariant = perUser
      .groupBy(col("__variant"))
      .agg(count(lit(1)).as("__n"), sum(col("__conv")).as("__c"))
    val a = perVariant.orderBy(col("__variant").asc).limit(1)
      .select(col("__variant").as("variant_a"),
        col("__n").as("n_a"), col("__c").as("conv_a"))
    // Second-lowest variant: last of the ascending first two — NOT the
    // lexicographic maximum, which silently paired A with Z when more
    // than two variants were present.
    val b = perVariant.orderBy(col("__variant").asc).limit(2)
      .orderBy(col("__variant").desc).limit(1)
      .select(col("__variant").as("variant_b"),
        col("__n").as("n_b"), col("__c").as("conv_b"))
    val ra = col("conv_a").cast("double") / col("n_a").cast("double")
    val rb = col("conv_b").cast("double") / col("n_b").cast("double")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    a.crossJoin(b)
      // one-variant input would pair the variant with ITSELF (the
      // limit(2)-desc-limit(1) frame returns the same row) and emit a
      // nonsense 0/0 = NaN z — a misconfigured experiment must fail
      // loudly, not render as a self-comparison row on a dashboard
      .withColumn("variant_b",
        when(col("variant_a") === col("variant_b"),
          raise_error(lit("conversionZTest: only one variant present " +
            "— a two-proportion test needs two")))
          .otherwise(col("variant_b")))
      .withColumn("rate_a", round(ra, 6))
      .withColumn("rate_b", round(rb, 6))
      .withColumn("z_score", round(
        (ra - rb) / sqrt(pooled * (lit(1.0) - pooled) *
          (lit(1.0) / col("n_a").cast("double") +
            lit(1.0) / col("n_b").cast("double"))), 6))
  }

  /** Welch's unequal-variance two-sample t-test — the continuous-
    * metric sibling of [[conversionZTest]] (that one compares
    * proportions; experiments on revenue/latency/quality-score means
    * need this, and Student's equal-variance pooling is exactly the
    * assumption A/B variants violate). Reports t and the
    * Welch–Satterthwaite effective degrees of freedom — the two
    * numbers a results dashboard feeds into the t-distribution.
    *
    * Determinism: per-variant moments are exact DECIMAL(18,6) sums
    * (partition-order-free, the [[Analytics.zscoreOutliers]]
    * discipline); t and df are then fixed IEEE trees over those exact
    * inputs, rounded to 6 dp. Variant pairing follows
    * [[conversionZTest]]: the two lexicographically-lowest variants.
    *
    * Scale shape: one variant-keyed moment aggregate (map-side
    * combinable, ≤ |variants| rows), then one-row arithmetic.
    */
  def welchTTest(
      df: DataFrame, variantCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,6)")
    val perVariant = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(variantCol).as("__variant"))
      .agg(count(lit(1)).as("__n"),
        sum(v).cast("double").as("__s1"),
        sum(v * v).cast("double").as("__s2"))
    val a = perVariant.orderBy(col("__variant").asc).limit(1)
      .select(col("__variant").as("variant_a"), col("__n").as("n_a"),
        col("__s1").as("__s1a"), col("__s2").as("__s2a"))
    val b = perVariant.orderBy(col("__variant").asc).limit(2)
      .orderBy(col("__variant").desc).limit(1)
      .select(col("__variant").as("variant_b"), col("__n").as("n_b"),
        col("__s1").as("__s1b"), col("__s2").as("__s2b"))
    def mean(s1: Column, n: Column) = s1 / n.cast("double")
    def varOverN(s1: Column, s2: Column, n: Column) = {
      val nd = n.cast("double")
      ((s2 - s1 * s1 / nd) / (nd - lit(1.0))) / nd
    }
    val va = varOverN(col("__s1a"), col("__s2a"), col("n_a"))
    val vb = varOverN(col("__s1b"), col("__s2b"), col("n_b"))
    a.crossJoin(b)
      // same single-variant guard as [[conversionZTest]]
      .withColumn("variant_b",
        when(col("variant_a") === col("variant_b"),
          raise_error(lit("welchTTest: only one variant present — a " +
            "two-sample test needs two")))
          .otherwise(col("variant_b")))
      .withColumn("mean_a", round(mean(col("__s1a"), col("n_a")), 6))
      .withColumn("mean_b", round(mean(col("__s1b"), col("n_b")), 6))
      .withColumn("t_stat", round(
        (mean(col("__s1a"), col("n_a")) - mean(col("__s1b"), col("n_b"))) /
          sqrt(va + vb), 6))
      .withColumn("df_welch", round(
        (va + vb) * (va + vb) /
          (va * va / (col("n_a").cast("double") - lit(1.0)) +
            vb * vb / (col("n_b").cast("double") - lit(1.0))), 6))
      .select("variant_a", "variant_b", "n_a", "n_b", "mean_a", "mean_b",
        "t_stat", "df_welch")
  }

  /** Kaplan–Meier survival curve — the censoring-correct retention
    * estimate ([[retentionWeekly]] counts who CAME BACK; this
    * estimates how long users LAST when many are still alive at the
    * observation edge, which naive "avg lifetime" silently
    * understates). Input: one row per subject with an integer
    * `durationCol` and boolean `observedCol` (true = the terminal
    * event happened; false = censored at that duration).
    *
    * Estimator: over distinct durations t ascending, with n_t = at
    * risk, d_t = events at t: S(t) = Π_{u≤t} (1 − d_u/n_u).
    *
    * Determinism: each factor is 1−d/n = (n−d)/n, an exact integer
    * ratio, so ln(factor) is ONE [[graft.functions.DetMath.lnq]] on
    * it, floor-quantized to ⌊ln·10¹²⌋; the product becomes an exact
    * integer prefix sum and S(t) is one [[graft.functions
    * .DetMath.expq]] per output row — bit-identical cross-engine, the
    * PSI/DSIR discipline applied to a running product. A duration
    * where everyone at risk dies (n = d) zeroes the curve from there
    * on (flagged, not ln(0)).
    *
    * Scale shape: one duration-keyed count aggregate collapses the
    * population to ≤ |distinct durations| rows, then TWO
    * [[graft.plans.Prefix.withRunningSums]] passes over that bounded
    * table (at-risk needs the prior-row sum before the term exists;
    * the survival sum needs the term) — no unpartitioned window
    * anywhere. Output: (duration, n_risk, n_events, n_censored,
    * survival).
    */
  def kaplanMeier(
      df: DataFrame, durationCol: String, observedCol: String): DataFrame = {
    val byT = df
      .filter(col(durationCol).isNotNull)
      .groupBy(col(durationCol).cast("long").as("duration"))
      .agg(
        sum(when(col(observedCol), 1L).otherwise(0L)).as("n_events"),
        sum(when(col(observedCol), 0L).otherwise(1L)).as("n_censored"))
      .withColumn("__dc", col("n_events") + col("n_censored"))
    val total = byT.agg(sum(col("__dc")).as("__N"))
    val withRisk = graft.plans.Prefix
      .withRunningSum(byT, Seq(col("duration")), "__dc", "__cum_dc")
      .crossJoin(broadcast(total))
      .withColumn("n_risk", col("__N") - (col("__cum_dc") - col("__dc")))
    val termed = withRisk
      .withColumn("__zero", when(col("n_risk") === col("n_events"), 1L)
        .otherwise(0L))
      // clamp keeps the (n=d ⇒ ratio 0) row finite in engines that
      // evaluate the whole ln chain before the CASE; the term is
      // discarded by the zero flag either way.
      .withColumn("__tq",
        when(col("__zero") === 1L, 0L)
          .when(col("n_events") === 0L, 0L)
          .otherwise(floor(graft.functions.DetMath.lnq(greatest(
            (col("n_risk") - col("n_events")).cast("double") /
              col("n_risk").cast("double"), lit(1e-300))) * lit(1e12))
            .cast("long")))
    graft.plans.Prefix
      .withRunningSums(termed, Seq(col("duration")),
        Seq("__tq" -> "__cum_tq", "__zero" -> "__cum_zero"))
      .withColumn("survival",
        when(col("__cum_zero") > 0L, lit(0.0))
          .otherwise(graft.functions.DetMath.expq(
            col("__cum_tq").cast("double") / lit(1e12))))
      .select("duration", "n_risk", "n_events", "n_censored", "survival")
  }

  /** Decile lift table (gains chart): rank rows by score descending,
    * cut into `buckets` equal tiles, and report each tile's positive
    * rate against the base rate — "the top decile converts at 3.1×
    * base" — the standard targeting/calibration readout for any scorer
    * ([[graft.ext.Drift.rocAuc]] summarizes the same ranking in one
    * number; this shows WHERE the separation lives).
    *
    * Scale + determinism shape: tiling is
    * [[graft.plans.Ordinal.withNtile]] (range partition + per-partition
    * counts — SQL NTILE semantics, no global sort, no single-partition
    * window) with an explicit unique tie-break column; cumulative
    * counts run over the `buckets`-row aggregate through
    * [[graft.plans.Prefix]]; every rate/lift is an IEEE division of
    * exact integers, floor-quantized to 6 dp. Lifts are null when no
    * positives exist at all.
    *
    * Output per tile: (bucket, n, n_pos, rate, lift, cum_lift).
    */
  def liftTable(
      df: DataFrame, scoreCol: String, tieCol: String, isPositive: Column,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val scored = df
      .filter(col(scoreCol).isNotNull)
      .select(col(scoreCol).as("__s"), col(tieCol).as("__id"),
        when(isPositive, 1L).otherwise(0L).as("__y"))
    val tiled = graft.plans.Ordinal.withNtile(
      scored, Seq(col("__s").desc, col("__id").asc), buckets, "bucket")
    val per = tiled.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    val cum = graft.plans.Prefix.withRunningSums(
      per, Seq(col("bucket")), Seq("n" -> "__cn", "n_pos" -> "__cp"))
    val tot = per.agg(
      sum(col("n")).as("__tn"), sum(col("n_pos")).as("__tp"))
    def q6(c: Column) = floor(c * lit(1e6)) / lit(1e6)
    val overall = col("__tp").cast("double") / col("__tn").cast("double")
    val rate = col("n_pos").cast("double") / col("n").cast("double")
    val cumRate = col("__cp").cast("double") / col("__cn").cast("double")
    cum.crossJoin(broadcast(tot))
      .select(
        col("bucket"), col("n"), col("n_pos"),
        q6(rate).as("rate"),
        when(col("__tp") > 0, q6(rate / overall)).as("lift"),
        when(col("__tp") > 0, q6(cumRate / overall)).as("cum_lift"))
  }

  /** CUPED (Controlled-experiment Using Pre-Experiment Data) adjusted
    * means — the standard variance-reduction companion to
    * [[conversionZTest]]: each user's post-period metric is debiased by
    * their own pre-period level,
    *
    *   ŷ_i = y_i − θ·(x_i − x̄),   θ = cov(x, y) / var(x)
    *
    * (θ fit POOLED across variants — fitting per-arm would absorb the
    * treatment effect), shrinking the metric variance by the squared
    * pre/post correlation and making small lifts detectable.
    *
    * Scale shape: ONE user-key shuffle builds per-user (variant, pre,
    * post); everything after is variant-cardinality-bounded aggregates
    * and one-row broadcasts. No window, no collect.
    *
    * Determinism (the [[graft.ext.Olap]] moment discipline): the raw
    * value is quantized to DECIMAL(18,6) before any sum, per-user
    * pre/post re-quantized to DECIMAL(18,6), and every pooled moment
    * (n, Σx, Σy, Σx², Σxy) is an exact DECIMAL sum of decimal
    * products — partial-aggregation order cannot drift them. θ and the
    * adjusted means are straight-line double arithmetic on those exact
    * values, floor-quantized to 6 dp (round()-on-double is the
    * cross-engine trap — see [[graft.ext.Drift.psi]]).
    *
    * Output: one row per variant — (variant, n_users, mean_post,
    * mean_adjusted); mean_adjusted is null when var(x) is 0.
    */
  def cupedAdjustedMeans(
      df: DataFrame, userCol: String, variantCol: String,
      valueCol: String, isPre: Column): DataFrame = {
    val v = coalesce(col(valueCol).cast("decimal(18,6)"),
      lit(0).cast("decimal(18,6)"))
    val perUser = df
      .groupBy(col(variantCol).as("variant"), col(userCol))
      .agg(
        sum(when(isPre, v).otherwise(lit(0).cast("decimal(18,6)")))
          .cast("decimal(18,6)").as("__x"),
        sum(when(isPre, lit(0).cast("decimal(18,6)")).otherwise(v))
          .cast("decimal(18,6)").as("__y"))
    val pooled = perUser.agg(
      count(lit(1)).as("__n"),
      sum(col("__x")).as("__sx"),
      sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__x") * col("__y")).as("__sxy"))
    val perVariant = perUser
      .groupBy(col("variant"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("__x")).as("__vx"),
        sum(col("__y")).as("__vy"))
    val n = col("__n").cast("double")
    val varX = n * col("__sxx").cast("double") -
      col("__sx").cast("double") * col("__sx").cast("double")
    val theta = (n * col("__sxy").cast("double") -
      col("__sx").cast("double") * col("__sy").cast("double")) / varX
    val preMeanPooled = col("__sx").cast("double") / n
    val nV = col("n_users").cast("double")
    val meanPost = col("__vy").cast("double") / nV
    val adjusted = meanPost -
      theta * (col("__vx").cast("double") / nV - preMeanPooled)
    perVariant.crossJoin(broadcast(pooled))
      .select(
        col("variant"), col("n_users"),
        (floor(meanPost * lit(1e6)) / lit(1e6)).as("mean_post"),
        when(varX > 0.0, floor(adjusted * lit(1e6)) / lit(1e6))
          .as("mean_adjusted"))
  }

  /** Cohort lifetime value: users cohorted by the ISO week of their
    * first event (ANY type — acquisition week), then `valueCol` over
    * `revenueType` events summed per (cohort_week, week_offset). Read
    * along a row: how a cohort's spend decays with age; down a column
    * offset: whether newer cohorts monetize better — the revenue
    * companion to [[retentionWeekly]]'s activity curve.
    *
    * Scale + determinism shape: same ONE user-key shuffle as retention
    * (cohort assignment is a window-min over the user partition the
    * final aggregate reuses); revenue sums are exact DECIMAL(18,4), so
    * partial-aggregation order cannot drift them; the double cast
    * happens once at output.
    */
  def cohortLtv(
      df: DataFrame, userCol: String, typeCol: String, tsCol: String,
      valueCol: String, revenueType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    df
      .withColumn("__cohort",
        to_date(date_trunc("week", min(col(tsCol)).over(w))))
      .filter(col(typeCol) === revenueType)
      .withColumn("__week", to_date(date_trunc("week", col(tsCol))))
      .groupBy(
        col("__cohort").as("cohort_week"),
        (datediff(col("__week"), col("__cohort")) / 7)
          .cast("long").as("week_offset"))
      .agg(
        sum(col(valueCol).cast("decimal(18,4)")).cast("double")
          .as("revenue"),
        countDistinct(col(userCol)).as("n_buyers"))
  }

  /** RFM segmentation — the classic customer-value grid: per entity,
    * Recency (days since last activity, against `anchor`), Frequency
    * (activity count) and Monetary (decimal-exact value sum), each
    * scored into quintiles 1..5 with 5 = best (most recent / most
    * frequent / highest spend), plus the concatenated segment code
    * ("555" = champions, "111" = lost).
    *
    * Scale + determinism shape: one entity-keyed aggregate, then three
    * quintile passes on the DISTRIBUTED global ntile
    * ([[graft.plans.Ordinal.withNtile]] — range partition, never a
    * single-partition window; tile semantics identical to SQL
    * NTILE, proven by q_ntile_deciles). Every ordering carries the
    * entity id as tie-break — a total order, so scores are
    * partition- and engine-stable. Recency is whole days
    * (date-difference — exact integers).
    */
  def rfm(
      df: DataFrame, entityCol: String, tsCol: String, valueCol: String,
      anchor: String): DataFrame = {
    val base = df
      .groupBy(col(entityCol))
      .agg(
        datediff(lit(anchor).cast("date"), to_date(max(col(tsCol))))
          .cast("long").as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double")
          .as("monetary"))
    val id = col(entityCol)
    val r = graft.plans.Ordinal.withNtile(
      base, Seq(col("recency_days").desc, id.asc), 5, "r_score")
    val f = graft.plans.Ordinal.withNtile(
      r, Seq(col("frequency").asc, id.asc), 5, "f_score")
    val m = graft.plans.Ordinal.withNtile(
      f, Seq(col("monetary").asc, id.asc), 5, "m_score")
    m.withColumn("segment",
      concat(col("r_score").cast("string"), col("f_score").cast("string"),
        col("m_score").cast("string")))
  }

  /** Daily audience growth: per day, how many users were seen for the
    * FIRST time, and the cumulative distinct-user count to date. The
    * classic "DAU is flat — are we acquiring or churning?" curve, and
    * a corpus-growth counter when `userCol` is a source/author id.
    *
    * Scale shape: first-seen is a user-keyed min aggregate (one
    * shuffle, map-side combinable), day counts collapse that to ≤ one
    * row per DAY — and the running sum is the distributed prefix pass
    * ([[graft.plans.Prefix.withRunningSum]]: range partition + carry
    * offsets). The daily frame is calendar-bounded anyway, but using
    * the prefix pass here removes the last single-partition
    * `Window.orderBy` in the library — no operator keeps a "bounded
    * in practice" exception a caller could violate.
    */
  def cumulativeDistinctUsers(
      df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstSeen = df
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol))
      .agg(to_date(min(col(tsCol))).as("day"))
    val daily = firstSeen.groupBy(col("day"))
      .agg(count(lit(1)).as("n_new_users"))
    graft.plans.Prefix.withRunningSum(
      daily, Seq(col("day")), "n_new_users", "n_cumulative_users")
  }

  /** Last-touch attribution: each conversion event is credited to the
    * user's most recent PRECEDING touch event within `windowDays`
    * (channel = that touch's type), or to "direct" when no touch
    * qualifies. One row per conversion:
    * (conversion id, user, conv_ts, value, channel, touch_ts).
    *
    * Determinism: events are ordered by (ts, id) inside each user —
    * simultaneous-timestamp rows cannot flip the "latest touch" across
    * engines or partitionings; the credited touch is a conditional
    * last-non-null over ROWS … 1 PRECEDING, so a conversion at the
    * same instant as a touch does NOT credit it (strictly-preceding
    * row semantics, mirrored in the oracle).
    *
    * Scale shape: ONE user-keyed shuffle; the window walks each user's
    * history in ts order. Per-user history is the natural bound — for
    * pathological hot users cap upstream ([[graft.ext.Sampling]]
    * quotaCap), which no window strategy can do for you.
    */
  def lastTouchAttribution(
      df: DataFrame, idCol: String, userCol: String, typeCol: String,
      tsCol: String, valueCol: String,
      conversionType: String, touchTypes: Seq[String],
      windowDays: Int): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(windowDays > 0, s"windowDays must be positive: $windowDays")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol).isin(touchTypes: _*),
      struct(col(tsCol).as("ts"), col(typeCol).as("ch")))
    df
      .withColumn("__touch", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .withColumn("__qualified",
        col("__touch").isNotNull &&
          col("__touch.ts") >= col(tsCol) - expr(s"INTERVAL $windowDays DAYS"))
      .select(
        col(idCol),
        col(userCol),
        col(tsCol).as("conv_ts"),
        col(valueCol).as("conv_value"),
        when(col("__qualified"), col("__touch.ch"))
          .otherwise(lit("direct")).as("channel"),
        when(col("__qualified"), col("__touch.ts")).as("touch_ts"))
  }
}
