package graft.sink

import org.apache.spark.sql.DataFrame

/** [EXT] Bucketed lake tables: pre-shuffle a fact table ONCE at write
  * time so every later join/aggregation on the bucket key runs with no
  * exchange at all.
  *
  * At 100 TB the dominant cost of a fact-fact join is shuffling both
  * sides. Writing both tables bucketed by the join key into the same
  * bucket count gives Spark's scan-level bucketing guarantee: matching
  * keys are already co-located per bucket file, so the join plans as
  * bucket-local SortMergeJoin with ZERO Exchange on either side — the
  * shuffle is paid once at ingest instead of once per query. `sortBy`
  * additionally pre-sorts within buckets, eliminating the join's sort.
  */
object BucketedLake {

  /** Write `df` as a bucketed managed parquet table. Both sides of a
    * co-located join must use the SAME `buckets` count and key.
    */
  def writeBucketed(
      df: DataFrame, table: String,
      bucketCols: Seq[String], buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }
}
