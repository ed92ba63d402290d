package graft.stream

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** [EXT] Streaming CDC apply: maintain a key-unique parquet snapshot
  * from an unbounded change stream — the continuous form of
  * [[graft.ops.Merge.mergeInto]]. No reference equivalent (the
  * reference's K2 upsert is per-file batch; this is the same contract
  * fed by a stream).
  *
  * Each micro-batch runs in `foreachBatch`:
  *   1. collapse the batch to its LAST change per key (by `seqCol` —
  *      a batch may carry several changes to one key; MERGE needs a
  *      key-unique source, and last-write-wins is the CDC contract);
  *   2. MERGE into the current snapshot (update/insert/delete arms);
  *   3. write the new snapshot to a fresh directory, then atomically
  *      swap a `current` pointer file.
  *
  * Exactly-once: the checkpoint pins which source files each batch
  * consumed. A batch replayed after a crash re-runs the SAME merge on
  * whichever snapshot generation is current — re-applying a change
  * set is idempotent under last-write-wins (same keys → same final
  * rows), so the snapshot converges regardless of where the replay
  * cut fell. The swap itself is a one-file atomic move.
  *
  * Scale shape: the merge is ONE outer join per micro-batch; AQE
  * broadcast-flips it because a change batch is small next to the
  * snapshot. The snapshot rewrite is the real cost at scale — a
  * production deployment partitions the snapshot and rewrites only
  * the partitions the batch touches (partition-overwrite, same move
  * as [[graft.sink.Sinks]] ParquetSink); generations keep that
  * contract simple here.
  */
object StreamMerge {

  /** Path of the live snapshot generation, or None before the first
    * commit. The pointer file holds the generation directory name.
    */
  def currentSnapshotDir(rootDir: String): Option[String] = {
    val ptr = Paths.get(rootDir, "current")
    if (Files.exists(ptr))
      Some(Paths.get(rootDir, Files.readString(ptr).trim).toString)
    else None
  }

  /** Read the live snapshot (empty frame with `schema` columns via
    * `emptyLike` when no generation exists yet).
    */
  private def readSnapshot(
      spark: SparkSession, rootDir: String,
      emptyLike: DataFrame): DataFrame =
    currentSnapshotDir(rootDir) match {
      case Some(dir) => spark.read.parquet(dir)
      case None => emptyLike.limit(0)
    }

  /** Start the apply loop. `changes` must be a streaming frame carrying
    * the snapshot schema + `deleteCol` + `seqCol`; the maintained
    * snapshot holds the snapshot schema (key columns + data columns).
    */
  def start(
      changes: DataFrame, keyCols: Seq[String], deleteCol: String,
      seqCol: String, rootDir: String, checkpointDir: String,
      triggerMs: Long = 1000L): StreamingQuery = {
    require(changes.isStreaming, "changes must be a streaming DataFrame")
    val snapshotCols = changes.columns
      .filterNot(c => c == deleteCol || c == seqCol).toSeq
    changes.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // Last change per key wins inside the batch (seqCol order,
          // exact ties broken by the delete flag so a delete+reinsert
          // tick is deterministic).
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(keyCols.map(col): _*)
            .orderBy(col(seqCol).desc, col(deleteCol).desc)
          val collapsed = batch
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1)
            .drop("__rn", seqCol)
          val target = readSnapshot(
            spark, rootDir, batch.select(snapshotCols.map(col): _*))
          val merged = graft.ops.Merge.mergeInto(
            target, collapsed, keyCols, deleteCol)
          val gen = f"gen-$batchId%09d"
          merged.write.mode("overwrite")
            .parquet(Paths.get(rootDir, gen).toString)
          val tmp = Paths.get(rootDir, s".current-$batchId")
          Files.writeString(tmp, gen)
          Files.move(tmp, Paths.get(rootDir, "current"),
            StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        }
        () // keep the lambda (DataFrame, Long) => Unit for overload resolution
      }
      .start()
  }
}
