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

  /** Bloom sidecar directory (point-lookup index — min/max stats are
    * useless for a point predicate on a high-cardinality key unless
    * the layout happens to cluster it).
    */
  val BloomDir = "_graft_bloom"

  /** The `i`-th Bloom position of a key — the portable md5 convention
    * ([[graft.ext.Sketches.countMin]]'s row-hash shape), so the index
    * is re-derivable in any engine with md5.
    */
  private def bloomPos(i: Int, key: org.apache.spark.sql.Column,
      mBits: Int): org.apache.spark.sql.Column =
    graft.functions.HashExprs.md5Prefix60(
      concat(lit(i.toString), lit(":"), key.cast("string"))) % mBits

  private def bloomPosScalar(i: Int, key: String, mBits: Int): Long =
    graft.functions.Md5Ops.prefix60(
      s"$i:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8)) % mBits

  /** Write a per-file Bloom filter over `keyCol` as a long-form
    * sidecar (file, word_idx, bits): each key sets `hashes` bits in an
    * `mBits`-bit filter, OR-aggregated per 64-bit word with the
    * `bit_or` aggregate — map-side combinable, the shuffle carries at
    * most files × mBits/64 rows, never the keys. False-positive rate
    * ≈ (1 − e^(−hashes·n/mBits))^hashes; size mBits/8 bytes per file
    * (the Parquet/Delta bloom-filter trade in library form).
    *
    * Call after [[writeIndexed]] (indexes what is ON DISK, same
    * contract as the stats pass).
    */
  def writeBloomSidecar(
      spark: SparkSession, path: String, keyCol: String,
      mBits: Int = 4096, hashes: Int = 3): Unit = {
    require(mBits >= 64 && mBits % 64 == 0, s"mBits must be a multiple of 64: $mBits")
    require(hashes >= 1 && hashes <= 8, s"hashes in [1,8]: $hashes")
    val posCols = (0 until hashes).map(i =>
      bloomPos(i, col(keyCol), mBits).as(s"__p$i"))
    spark.read.parquet(path)
      .select(input_file_name().as("file") +: posCols: _*)
      .select(col("file"), explode(array(
        (0 until hashes).map(i => col(s"__p$i")): _*)).as("__pos"))
      .select(col("file"),
        expr("__pos div 64").as("word_idx"),
        expr("shiftleft(1L, cast(__pos % 64 as int))").as("__bit"))
      .groupBy(col("file"), col("word_idx"))
      .agg(expr("bit_or(__bit)").as("bits"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/$BloomDir")
  }

  /** Point-lookup scan: keep only files whose Bloom filter contains
    * ALL `hashes` bit positions of `value` (exact keys always survive;
    * a false positive only costs an extra file read, never a missed
    * row). Only the ≤ `hashes` relevant sidecar words per file are
    * collected — bounded driver state regardless of mBits. The
    * residual equality filter still runs on the surviving files.
    *
    * `mBits`/`hashes` must match the [[writeBloomSidecar]] call.
    */
  def scanPrunedByKey(
      spark: SparkSession, path: String, keyCol: String, value: String,
      mBits: Int = 4096, hashes: Int = 3): (DataFrame, PruneReport) = {
    val positions = (0 until hashes).map(i => bloomPosScalar(i, value, mBits))
    val wanted = positions.map(p => (p / 64, 1L << (p % 64).toInt))
    val words = wanted.map(_._1).distinct
    // word filter pushes down to the sidecar scan; result is ≤
    // |distinct words| rows per file.
    val rows = spark.read.parquet(s"$path/$BloomDir")
      .filter(col("word_idx").isin(words: _*))
      .select(col("file"), col("word_idx"), col("bits"))
      .collect()
    val byFile = rows.groupBy(_.getString(0)).map { case (f, rs) =>
      f -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap
    }
    val allFiles = spark.read.parquet(s"$path/$StatsDir")
      .select(col("file")).collect().map(_.getString(0))
    val kept = allFiles.filter { f =>
      val fileWords = byFile.getOrElse(f, Map.empty[Long, Long])
      wanted.forall { case (w, bit) =>
        (fileWords.getOrElse(w, 0L) & bit) != 0L
      }
    }
    val base =
      if (kept.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(kept.toIndexedSeq: _*)
    (base.filter(col(keyCol).cast("string") === value),
      PruneReport(allFiles.length.toLong, kept.length.toLong))
  }
}
