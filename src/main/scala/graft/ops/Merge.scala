package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE INTO semantics (the lakehouse upsert contract) built
  * from one outer join — no table format required, works on any
  * snapshot the pipeline maintains (extends the reference's K2
  * last-write-wins upsert, `pipeline.py:150-171`, with delete and
  * insert arms).
  *
  * Semantics per target key:
  *   - matched by a source row with `deleteCol` true  → dropped;
  *   - matched by a source row with `deleteCol` false → replaced by
  *     the source row (whole-row update);
  *   - unmatched target rows pass through;
  *   - source rows matching no target (and not deletes) are inserted.
  *
  * Scale shape: ONE full-outer hash join on the key — both sides
  * shuffle once; AQE broadcast-flips it when the change set is small
  * (the usual case: a trickle of updates against a huge snapshot).
  * The source must be key-unique; enforce upstream with
  * [[Prep.upsertLatest]] — this operator fails fast on duplicates
  * rather than silently fanning out target rows.
  */
object Merge {

  def mergeInto(
      target: DataFrame, source: DataFrame, keyCols: Seq[String],
      deleteCol: String): DataFrame = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val dataCols = target.columns.filterNot(keyCols.contains).toSeq
    require(source.columns.toSet == target.columns.toSet + deleteCol,
      s"source must carry the target schema + $deleteCol")

    // Fail fast on a non-unique source: a duplicated change-set key
    // would duplicate the target row it matches. The guard is folded
    // into the (always-evaluated) delete flag so Catalyst cannot prune
    // it as dead code; the count-window shuffles only the SOURCE side
    // — the small change set, not the snapshot.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    // A null delete flag would silently corrupt the merge downstream
    // (null __del doubles as the "no source row" sentinel after the
    // outer join: the update arm would be skipped and an insert would
    // emit all-null data columns) — fail fast like a duplicate key.
    val guardedDel = when(count(lit(1)).over(w) > 1,
      raise_error(concat(lit("duplicate merge-source key: "),
        concat_ws("/", keyCols.map(c => col(c).cast("string")): _*)))
        .cast("boolean"))
      .when(col(deleteCol).isNull,
        raise_error(concat(lit(s"null $deleteCol in merge source for key: "),
          concat_ws("/", keyCols.map(c => col(c).cast("string")): _*)))
          .cast("boolean"))
      .otherwise(col(deleteCol))
    val src = source
      .withColumn("__del", guardedDel)
      .drop(deleteCol)
    val srcPrefixed = src.select(
      keyCols.map(col) ++
        dataCols.map(c => col(c).as(s"__src_$c")) :+ col("__del"): _*)

    target.join(srcPrefixed, keyCols, "full_outer")
      // matched delete rows drop out; delete-only source rows (no
      // matching target) are no-ops by the same predicate
      .filter(!coalesce(col("__del"), lit(false)))
      .select(keyCols.map(col) ++ dataCols.map { c =>
        // source wins where present: update arm for matches, insert
        // arm for source-only rows; target passes through otherwise
        when(col("__del").isNotNull, col(s"__src_$c"))
          .otherwise(col(c)).as(c)
      }: _*)
  }
}
