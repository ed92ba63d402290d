package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row}
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
  * `zipWithIndex`, which numbers rows as partitionOffset + localIndex.
  * Its internal size-count job and the main pass run on the SAME
  * materialized RDD lineage, so the shuffle output is computed once and
  * partition ids cannot drift between passes.
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
    val numbered = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(numbered, schema)
  }
}
