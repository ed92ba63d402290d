package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] The read side of the Z-ordered lake: per-FILE min/max stats
  * written as a sidecar at index time, then a scan planner that prunes
  * the file list against range predicates BEFORE Spark ever opens a
  * footer — the Delta/Iceberg data-skipping shape in library form.
  *
  * Why per-file (vs [[ZOrderedLake.zoneMap]]'s per-cell index): files
  * are the unit a scan can actually skip. The zone map remains the
  * layout-quality / incremental-maintenance view; this sidecar is the
  * planner's index. Under [[ZOrderedLake.writeZOrdered]] both
  * dimensions are bounded per file, so a range filter on EITHER
  * dimension prunes most files — the whole point of the Morton layout.
  *
  * Scale shape: the sidecar holds ONE ROW PER FILE (a 100 TB lake at
  * 1 GB files = ~100k rows), so collecting it on the driver for
  * planning is bounded and cheap — the same contract as a Delta log
  * snapshot. The pruned read hands Spark an explicit file list; the
  * residual filter still runs (stats prune is conservative), and
  * parquet row-group stats prune further inside surviving files.
  */
object GraftLake {

  /** Sidecar directory name. Leading underscore => invisible to
    * Spark/Hadoop input listing, so `spark.read.parquet(path)` of the
    * data is unaffected by the index living inside it.
    */
  val StatsDir = "_graft_stats"

  final case class PruneReport(totalFiles: Long, keptFiles: Long)

  /** Z-order-cluster `df` into `files` parquet files at `path` and
    * write the per-file (count, min, max × both dims) sidecar. The
    * stats pass re-reads the just-written files once — footer-cheap,
    * columnar, and it indexes what is actually ON DISK.
    */
  def writeIndexed(
      df: DataFrame, path: String, dimA: String, dimB: String,
      files: Int, bits: Int = 16): Unit = {
    ZOrderedLake.writeZOrdered(df, path, dimA, dimB, files, bits)
    val spark = df.sparkSession
    spark.read.parquet(path)
      .select(input_file_name().as("file"), col(dimA), col(dimB))
      .groupBy(col("file"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(dimA)).as(s"${dimA}_min"),
        max(col(dimA)).as(s"${dimA}_max"),
        min(col(dimB)).as(s"${dimB}_min"),
        max(col(dimB)).as(s"${dimB}_max"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$StatsDir")
  }

  /** Scan the lake with inclusive range predicates
    * (`dim -> (lo, hi)`), skipping every file whose stats box cannot
    * intersect them. Returns the filtered DataFrame (residual filters
    * applied — stats pruning is conservative, never a substitute for
    * the predicate) plus the prune report the caller can assert on.
    * Dimensions must be ones the sidecar indexed.
    */
  def scanPruned(
      spark: SparkSession, path: String,
      ranges: Map[String, (Long, Long)]): (DataFrame, PruneReport) = {
    require(ranges.nonEmpty, "scanPruned needs at least one range")
    val stats = spark.read.parquet(s"$path/$StatsDir")
    ranges.keys.foreach { d =>
      require(stats.columns.contains(s"${d}_min"),
        s"dimension not indexed in sidecar: $d")
    }
    val keep = ranges.map { case (d, (lo, hi)) =>
      col(s"${d}_max") >= lo && col(s"${d}_min") <= hi
    }.reduce(_ && _)
    // One row per file — bounded driver state (the Delta-log contract).
    val all = stats.select(col("file"), keep.as("__keep")).collect()
    val kept = all.filter(_.getBoolean(1)).map(_.getString(0))
    val base =
      if (kept.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(kept.toIndexedSeq: _*)
    val filtered = ranges.foldLeft(base) { case (d, (dim, (lo, hi))) =>
      d.filter(col(dim).between(lo, hi))
    }
    (filtered, PruneReport(all.length.toLong, kept.length.toLong))
  }
}
