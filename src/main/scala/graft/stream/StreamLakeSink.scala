package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sink.VersionedLake

/** [EXT] Streaming append into the versioned lake — each micro-batch
  * becomes one [[VersionedLake]] COMMIT, so the stream's output gets
  * everything the lake gives batch writers: immutable versions, time
  * travel to any batch boundary, and concurrent-reader safety. The
  * missing piece foreachBatch does NOT give by itself is idempotence:
  * after a crash the engine replays the last uncommitted batch, and a
  * naive sink appends it twice.
  *
  * Exactly-once here: the batch id is encoded in the committed data
  * dir name (`data/b<id>-<uuid>`), so "has batch N committed?" is a
  * lookup over the manifests (bounded, one line per commit — the
  * Delta `txn` action in file-name form). A replayed batch finds its
  * id and skips; a commit that loses the version race re-checks and
  * retries, so two racing writers cannot double-apply a batch.
  */
object StreamLakeSink {

  // Incremental manifest scan: manifests are immutable, so each lake
  // path caches (highest version scanned, batch ids seen) and every
  // call reads only the manifests committed SINCE — without this a
  // long-running stream does O(versions) manifest reads per
  // micro-batch, i.e. O(n²) over the stream's life. One set entry per
  // committed batch — the same bounded driver state as the log itself.
  private val scanned =
    scala.collection.mutable.Map[String, (Long, Set[Long])]()

  private val BatchDir = "data/b(\\d+)-.*".r

  /** True iff some committed manifest references `batchId`'s dir. */
  def batchCommitted(path: String, batchId: Long): Boolean = synchronized {
    val (hi, ids) = scanned.getOrElse(path, (0L, Set.empty[Long]))
    val fresh = VersionedLake.versions(path).filter(_ > hi)
    val all = ids ++ fresh.iterator
      .flatMap(v => VersionedLake.manifest(path, v))
      .collect { case BatchDir(id) => id.toLong }
    scanned(path) = (fresh.lastOption.getOrElse(hi), all)
    all.contains(batchId)
  }

  /** Commit one micro-batch idempotently; returns the version, or
    * None when the batch was already committed (replay) or empty.
    */
  def commitBatch(
      batch: DataFrame, path: String, batchId: Long): Option[Long] = {
    if (batch.isEmpty || batchCommitted(path, batchId)) None
    else {
      try Some(VersionedLake.commit(
        batch, path, overwrite = false,
        dataDirPrefix = s"b$batchId-"))
      catch {
        case _: VersionedLake.CommitConflictException =>
          // lost the version race — re-check (the winner may have
          // been OUR replay twin) and retry once
          if (batchCommitted(path, batchId)) None
          else Some(VersionedLake.commit(
            batch, path, overwrite = false,
            dataDirPrefix = s"b$batchId-"))
      }
    }
  }

  /** Start the stream: every micro-batch is one idempotent commit. */
  def start(
      df: DataFrame, path: String, checkpointDir: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch, path, batchId): Unit
      }
      .start()
}
