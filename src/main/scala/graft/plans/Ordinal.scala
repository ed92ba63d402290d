package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.functions.{col, floor, lit, when}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.types.LongType

/** Distributed global row numbering.
  *
  * The reference's positional semantics (error messages keyed on CSV line
  * number `pipeline.py:117`, round-robin tagging
  * `preprocessing_kaggle_dataset.py:36`, 5000-row chunking
  * `preprocessing_kaggle_dataset.py:56-62`) all need a total row order.
  * The naive Spark translation — `row_number().over(Window.orderBy(k))` —
  * collapses the whole table into ONE partition: fine at 60k rows,
  * catastrophic at 100 TB.
  *
  * Implementation: range-partition + sort by the key (the same shuffle a
  * global sort costs, so per-partition work stays bounded), then RDD
  * `zipWithIndex` over the plan's INTERNAL row RDD, which numbers rows
  * as partitionOffset + localIndex. Its internal size-count job and the
  * main pass run on the SAME materialized RDD lineage, so the shuffle
  * output is computed once and partition ids cannot drift between
  * passes. Working on `queryExecution.toRdd` + an UnsafeProjection
  * (instead of `Dataset.rdd` + `createDataFrame`) skips the
  * InternalRow→Row→InternalRow round trip — the per-row boxing tax that
  * made this the slowest step of every positional query.
  *
  * (A previous design computed per-partition counts in a separate
  * DataFrame job keyed on `spark_partition_id()` — wrong under AQE,
  * which may coalesce the two jobs' shuffle reads differently, shifting
  * the ids. RDD lineages are AQE-free and deterministic.)
  *
  * Determinism requires `order` to be a unique key (all call sites use
  * one: `event_id`, file line id, ...). Ties across a non-unique key
  * would be partition-placement dependent.
  */
object Ordinal {

  /** Adds `outCol` = 1-based global row number of `df` ordered by
    * `order`. `order` must be deterministic and unique.
    */
  def withGlobalRowNumber(
      df: DataFrame,
      order: Seq[Column],
      outCol: String,
      numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val sorted = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val numbered = GraftExpressionBridge.toInternalRdd(sorted)
      .zipWithIndex()
      .mapPartitions { iter =>
        // One projection per partition; its output buffer is reused per
        // row — the same contract as any codegen'd operator's output
        // (downstream operators copy when they buffer).
        val proj = UnsafeProjection.create(schema)
        val ordinal = new GenericInternalRow(1)
        val joined = new JoinedRow
        iter.map { case (row, idx) =>
          ordinal.setLong(0, idx + 1L)
          proj(joined(row, ordinal)): InternalRow
        }
      }
    GraftExpressionBridge.internalCreateDataFrame(spark, numbered, schema)
  }

  /** Global NTILE(k) without the single-partition window: standard SQL
    * ntile semantics (first n mod k tiles get one extra row) computed
    * arithmetically from the distributed global row number. `order`
    * must be unique, as for [[withGlobalRowNumber]].
    *
    * The total row count is taken in a separate count-only job (cheap:
    * no sort, no zipWithIndex) and folded in as a literal; everything
    * after the Ordinal shuffle is a pure projection.
    *
    * PRECONDITION: `df` must be stable across jobs (an immutable
    * snapshot). The count job and the numbering job each evaluate
    * `df` from source; a source that mutates between them (e.g. a
    * lake path receiving a commit) skews the tile boundaries
    * silently — read a pinned version (VersionedLake time travel)
    * when the source is mutable. Every call site in this repo reads
    * immutable parquet snapshots.
    */
  def withNtile(
      df: DataFrame, order: Seq[Column], k: Int,
      outCol: String): DataFrame = {
    require(k >= 1, s"ntile bucket count must be >= 1: $k")
    val n = df.count()
    val q = n / k
    val r = n % k
    val cut = r * (q + 1) // rows in the first r (larger) tiles
    val numbered = withGlobalRowNumber(df, order, "__rn")
    val off = col("__rn") - 1
    val tile =
      if (q == 0) off + 1 // more tiles than rows: row i -> tile i+1
      else when(off < cut, floor(off / (q + 1)) + 1)
        .otherwise(lit(r) + floor((off - cut) / q) + 1)
    numbered.withColumn(outCol, tile.cast("long")).drop("__rn")
  }
}
