package graft.sink

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** [EXT] Small-file compaction for parquet directories — the
  * maintenance job every long-running ingest needs: a streaming sink
  * committing every few seconds (the reference's per-file commit
  * cadence, `pipeline.py`) leaves thousands of KB-sized files, and at
  * 100 TB the scan-planning and open() overhead of millions of tiny
  * files dominates query time long before the bytes do.
  *
  * Strategy (table-format-free, rewrite-minimal):
  *   - files already >= `targetBytes` are COPIED byte-for-byte —
  *     parquet files are self-contained, so a copy is valid without
  *     decode/re-encode (no CPU, no fidelity questions);
  *   - small files are first-fit bin-packed (descending size) into
  *     ~`targetBytes` bins; each bin is read as one parquet scan and
  *     rewritten `coalesce(1)` — one output file per bin.
  * Output goes to a FRESH directory; the caller swaps it in (same
  * atomic-pointer discipline as [[graft.stream.StreamMerge]]) — never
  * compact in place under readers.
  *
  * Scale shape: the driver holds only the file listing (name + size);
  * each bin rewrite is an independent Spark job over just that bin's
  * bytes, and large files never enter an executor at all. Row
  * ordering within the directory is NOT preserved (parquet dirs are
  * unordered by contract).
  */
object Compaction {

  /** Returns (input file count, output file count). */
  def compactDir(
      spark: SparkSession, srcDir: String, destDir: String,
      targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(srcDir)
    val fs = src.getFileSystem(conf)
    val dest = new Path(destDir)
    fs.mkdirs(dest)
    val files = fs.listStatus(src).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val (big, small) = files.partition(_.getLen >= targetBytes)
    big.zipWithIndex.foreach { case (f, i) =>
      FileUtil.copy(fs, f.getPath, fs,
        new Path(dest, f"kept-$i%05d.parquet"),
        false, conf)
    }
    // First-fit decreasing bin packing on sizes (driver-side, over the
    // listing only).
    val bins = scala.collection.mutable.ArrayBuffer.empty[
      (Long, scala.collection.mutable.ArrayBuffer[String])]
    small.sortBy(-_.getLen).foreach { f =>
      bins.find(_._1 + f.getLen <= targetBytes) match {
        case Some(b) =>
          val i = bins.indexOf(b)
          bins(i) = (b._1 + f.getLen, b._2 += f.getPath.toString)
        case None =>
          bins += ((f.getLen,
            scala.collection.mutable.ArrayBuffer(f.getPath.toString)))
      }
    }
    // Each bin lands in a scratch dir, then its single part file is
    // moved up flat — destDir stays a plain readable parquet dir.
    bins.zipWithIndex.foreach { case ((_, paths), i) =>
      val tmp = new Path(dest, f".tmp-bin-$i%05d")
      spark.read.parquet(paths.toSeq: _*)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(tmp.toString)
      val part = fs.listStatus(tmp).toSeq
        .find(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file written for bin $i"))
      fs.rename(part.getPath, new Path(dest, f"bin-$i%05d.parquet"))
      fs.delete(tmp, true)
    }
    val outCount = fs.listStatus(dest).toSeq
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (files.size, outCount)
  }
}
