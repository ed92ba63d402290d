package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.Ordinal

/** P1/P2/P4/P5, K2/K6: the batch prep-job operators
  * (`preprocessing_kaggle_dataset.py`) plus upsert semantics.
  *
  * Positional operators (round-robin tag, chunk split) need a global row
  * order; Spark has none implicitly, so each takes an explicit unique
  * order key and uses [[Ordinal.withGlobalRowNumber]] — distributed, not
  * a single-partition window.
  */
object Prep {

  /** P1+P2: rename columns and project to a fixed order
    * (`preprocessing_kaggle_dataset.py:25-33`).
    */
  def renameProject(
      df: DataFrame,
      renames: Seq[(String, String)],
      order: Seq[String]): DataFrame = {
    val renamed = renames.foldLeft(df) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to)
    }
    renamed.select(order.map(col): _*)
  }

  /** P4: round-robin tag by row position — `ids[i % ids.size]`
    * (`preprocessing_kaggle_dataset.py:36`). `orderKey` must be unique.
    */
  def roundRobinTag(
      df: DataFrame,
      ids: Seq[String],
      orderKey: Column,
      outCol: String): DataFrame =
    Ordinal.withGlobalRowNumber(df, Seq(orderKey), "__graft_rn")
      .withColumn(outCol,
        element_at(
          array(ids.map(lit): _*),
          (((col("__graft_rn") - 1) % ids.size) + 1).cast("int")))
      .drop("__graft_rn")

  /** P5: parse + reformat timestamps to `yyyy-MM-dd HH:mm:ss`
    * (`preprocessing_kaggle_dataset.py:39-40`).
    */
  def tsParseFormat(c: Column): Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** K6: chunk id assignment `floor((rowpos-1)/chunkRows)`
    * (`preprocessing_kaggle_dataset.py:56-62`). Writing then uses
    * `.write.partitionBy(outCol)` so each chunk lands in its own
    * directory — the distributed analog of one-file-per-5000-rows.
    */
  def chunkSplit(
      df: DataFrame,
      chunkRows: Int,
      orderKey: Column,
      outCol: String): DataFrame =
    Ordinal.withGlobalRowNumber(df, Seq(orderKey), "__graft_rn")
      .withColumn(outCol, floor((col("__graft_rn") - 1) / chunkRows))
      .drop("__graft_rn")

  /** K2: last-write-wins upsert semantics as a batch operator — keep the
    * newest row per unique key (`INSERT … ON DUPLICATE KEY UPDATE`,
    * `pipeline.py:236-244`). `versionCols` orders versions ascending;
    * ties are broken by the LAST column so pass a unique tiebreaker.
    * One shuffle on the key; no global sort.
    */
  def upsertLatest(
      df: DataFrame,
      keyCols: Seq[String],
      versionCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(versionCols.map(_.desc): _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }
}
