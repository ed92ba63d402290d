package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Declarative data-quality audit — the Deequ-style constraint
  * suite a production lake runs before promoting a batch: row-level
  * predicates, key uniqueness, and referential integrity, each reported
  * as one row of (constraint, n_rows, n_violations, pass_rate). No
  * reference equivalent (the reference validates row-by-row and routes
  * files; this is the dataset-level gate a 100 TB promotion pipeline
  * needs on top).
  *
  * Scale shape: every auditor is aggregate-only — row checks fold into
  * ONE map-side-combinable pass regardless of how many predicates are
  * declared (each is a conditional sum in the same agg); uniqueness is
  * a two-level aggregate (key counts, then one row); FK orphans are a
  * left join against the DISTINCT parent keys (never a fan-out, AQE
  * free to broadcast small dims). Reports are one-row frames; a suite
  * is their union — the union of k tiny frames costs nothing next to
  * the k passes, and each pass is independently Catalyst-optimal.
  *
  * Determinism: counts are exact integers; pass_rate is the only float
  * and is rounded to 6 dp (cross-engine convention).
  */
object Quality {

  private def report(
      name: Column, nRows: Column, nViolations: Column): Seq[Column] = Seq(
    name.as("check_name"),
    nRows.cast("long").as("n_rows"),
    nViolations.cast("long").as("n_violations"),
    round((nRows - nViolations).cast("double") / nRows.cast("double"), 6)
      .as("pass_rate"))

  /** Row-predicate checks: one aggregate pass over `df`, one output row
    * per named violation predicate (`true` = the row violates).
    */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val aggs = checks.zipWithIndex.map { case ((_, viol), i) =>
      sum(when(viol, 1L).otherwise(0L)).as(s"__v$i")
    } :+ count(lit(1)).as("__n")
    val rows = checks.zipWithIndex.map { case ((name, _), i) =>
      struct(report(lit(name), col("__n"), col(s"__v$i")): _*)
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.*"))
  }

  /** Key-uniqueness check: violations = rows in excess of one per
    * distinct key (0 ⇔ the key is unique).
    */
  def uniqueCheck(
      df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(sum(col("__c")).as("__n"), count(lit(1)).as("__k"))
      .select(report(lit(name), col("__n"), col("__n") - col("__k")): _*)

  /** Referential-integrity check: child rows whose `childKey` has no
    * match among the distinct `parentKey` values (null child keys are
    * orphans too — a null FK can't reference anything).
    */
  def fkCheck(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame = {
    val p = parent.select(col(parentKey).as("__pk")).distinct()
    child.select(col(childKey).as("__ck"))
      .join(p, col("__ck") === col("__pk"), "left")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("__v"))
      .select(report(lit(name), col("__n"), col("__v")): _*)
  }

  /** A full audit = union of the individual reports. */
  def audit(reports: Seq[DataFrame]): DataFrame = {
    require(reports.nonEmpty, "empty audit")
    reports.reduce(_ unionByName _)
  }

  /** Benford first-digit audit — the classic fabricated-numbers
    * detector: organically-grown magnitudes (prices, populations,
    * transaction amounts) have first significant digit d with
    * probability log10(1 + 1/d); invented or truncated data does not.
    * One row per digit 1–9: observed count, observed share, Benford
    * expectation, and the signed deviation.
    *
    * The digit is taken from the INTEGER rendering of floor(value)
    * (rows with value < 1 are excluded) — string-of-integer is exact
    * in every engine, where a log10-based digit extraction can
    * misround at exact powers of ten. One count aggregate (9 keys) +
    * a broadcast total; shares are single IEEE divisions of exact
    * integers, identical everywhere, rounded to 6 dp.
    */
  /** k-anonymity audit over a quasi-identifier column set — the
    * privacy gate a corpus with person-derived records runs before
    * release: every row whose quasi-identifier combination is shared
    * by fewer than `k` rows is re-identifiable by linkage. One row per
    * violating equivalence class (the review artifact), with class
    * size and the share of the table it exposes.
    *
    * Scale shape: one quasi-identifier-keyed count aggregate
    * (map-side combined — the class table is bounded by the number of
    * DISTINCT combinations, not rows), a `< k` filter on that bounded
    * table, and a one-row broadcast total for the exposure share.
    * Exactness: counts are integers; `exposed_share` is one IEEE
    * division of exact integers (identical everywhere, unrounded).
    */
  def kAnonymityAudit(
      df: DataFrame, quasiIdCols: Seq[String], k: Long): DataFrame = {
    require(quasiIdCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2: $k")
    val classes = df
      .groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
    val total = df.agg(count(lit(1)).as("__n"))
    classes
      .filter(col("class_size") < k)
      .crossJoin(broadcast(total))
      .select(quasiIdCols.map(col) ++ Seq(
        col("class_size"),
        (col("class_size").cast("double") / col("__n").cast("double"))
          .as("exposed_share")): _*)
  }

  /** l-diversity audit — [[kAnonymityAudit]]'s homogeneity-attack
    * complement: a class can be large (k-anonymous) yet expose its
    * members anyway if nearly all of them share the SENSITIVE value
    * ("everyone in this zip-and-age bucket has the same diagnosis").
    * Flags every quasi-identifier class whose sensitive attribute
    * takes fewer than `l` distinct values.
    *
    * Same bounded shape as the k-audit: one two-level aggregate —
    * (QI, sensitive)-keyed collapse, then QI-keyed counts — both
    * map-side combinable; output is the violating classes only.
    */
  def lDiversityAudit(
      df: DataFrame, quasiIdCols: Seq[String], sensitiveCol: String,
      l: Long): DataFrame = {
    require(quasiIdCols.nonEmpty, "at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2: $l")
    df.groupBy((quasiIdCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(quasiIdCols.map(col): _*)
      .agg(sum(col("__c")).as("class_size"),
        count(lit(1)).as("n_sensitive_values"))
      .filter(col("n_sensitive_values") < l)
  }

  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val digits = df
      .filter(col(valueCol) >= 1)
      .select(substring(floor(col(valueCol)).cast("bigint").cast("string"),
        1, 1).cast("int").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val total = digits.agg(sum(col("n_obs")).as("__n"))
    digits
      .crossJoin(broadcast(total))
      .select(
        col("digit"),
        col("n_obs"),
        round(col("n_obs").cast("double") / col("__n").cast("double"), 6)
          .as("p_obs"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
          .as("p_benford"))
      .withColumn("deviation", round(col("p_obs") - col("p_benford"), 6))
  }
}
