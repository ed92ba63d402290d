package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance over the snapshots the
  * pipeline's K2 upsert keeps current (reference `pipeline.py:150-171`
  * holds only latest-value state; these operators add the dimension
  * *history* a warehouse needs around that same contract).
  *
  * Scale shape — both operators are single-shuffle:
  *   - [[scd2FromChangelog]] shuffles once on the dimension key; both
  *     window passes and the run-collapse filter reuse that one
  *     partitioning (the filter preserves distribution, so Catalyst
  *     plans exactly one Exchange). Partitions are per-key — no global
  *     window, no hot single task at any corpus size.
  *   - [[snapshotDiff]] is one full-outer hash join on the key; AQE
  *     broadcast-flips it when one snapshot is small. Unchanged rows
  *     are dropped before anything wide is emitted.
  */
object Scd {

  /** Rebuild SCD Type-2 history from an append-only changelog: one row
    * per (key, run of equal tracked values), with
    * `effective_from`/`effective_to` half-open validity ranges and an
    * `is_current` flag on each key's last version.
    *
    * Rows are ordered per key by (`tsCol`, `tieCol`) — the tiebreaker
    * makes history deterministic when one key changes twice in the
    * same tick. Consecutive rows whose tracked values are equal
    * (null-safe) collapse into the earlier row's run: re-asserting the
    * same value extends the current version instead of opening a new
    * one (standard SCD2 semantics).
    */
  def scd2FromChangelog(
      changes0: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, trackedCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && trackedCols.nonEmpty,
      "scd2 needs key and tracked columns")
    val byKey = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val tracked = struct(trackedCols.map(col): _*)
    // A change with no timestamp (or no tiebreaker) has no place on
    // the timeline — and engines DISAGREE on where nulls sort (Spark
    // windows put them first, most SQL engines last), so keeping them
    // would make history engine-dependent. Dropped, by contract.
    val changes = changes0
      .filter(col(tsCol).isNotNull && col(tieCol).isNotNull)
    // Version boundaries: first row of a key, or tracked values changed
    // vs the previous row (null-safe, so null -> value and value ->
    // null both open a new version).
    val opens = changes
      .withColumn("__prev", lag(tracked, 1).over(byKey))
      .filter(col("__prev").isNull || !(col("__prev") <=> tracked))
    // The filter keeps the key-hash distribution, so this second window
    // runs on the same Exchange. Run starts are distinct in
    // (tsCol, tieCol) per key — the lead order is total.
    val ends = lead(col(tsCol), 1).over(byKey)
    opens
      .select(
        keyCols.map(col) ++ trackedCols.map(col) ++ Seq(
          col(tsCol).as("effective_from"),
          ends.as("effective_to")): _*)
      .withColumn("is_current", col("effective_to").isNull)
  }

  /** CDC diff of two key-unique snapshots: one row per changed key with
    * `change_type` in insert/update/delete. Insert/update rows carry
    * the NEW values, delete rows the OLD values; unchanged keys emit
    * nothing. Value comparison is null-safe per column.
    */
  def snapshotDiff(
      oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    require(oldSnap.columns.toSeq == newSnap.columns.toSeq,
      "snapshots must share one schema")
    val dataCols = oldSnap.columns.filterNot(keyCols.contains).toSeq
    val o = oldSnap.select(
      keyCols.map(col) ++ dataCols.map(c => col(c).as(s"__old_$c")) :+
        lit(true).as("__in_old"): _*)
    val n = newSnap.select(
      keyCols.map(col) ++ dataCols.map(c => col(c).as(s"__new_$c")) :+
        lit(true).as("__in_new"): _*)
    val changed = dataCols
      .map(c => !(col(s"__old_$c") <=> col(s"__new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("insert"))
          .when(col("__in_new").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(
        keyCols.map(col) ++ dataCols.map { c =>
          when(col("change_type") === "delete", col(s"__old_$c"))
            .otherwise(col(s"__new_$c")).as(c)
        } :+ col("change_type"): _*)
  }
}
