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

  /** One incremental scan: (highest version seen, all batch ids
    * committed up to it). The high-water mark is what makes the
    * absent-check usable as a commit precondition — see
    * [[commitBatch]].
    */
  private def scanState(path: String): (Long, Set[Long]) = synchronized {
    val (hi, ids) = scanned.getOrElse(path, (0L, Set.empty[Long]))
    val fresh = VersionedLake.versions(path).filter(_ > hi)
    val all = ids ++ fresh.iterator
      .flatMap(v => VersionedLake.manifest(path, v))
      .collect { case BatchDir(id) => id.toLong }
    val newHi = fresh.lastOption.getOrElse(hi)
    scanned(path) = (newHi, all)
    (newHi, all)
  }

  /** True iff some committed manifest references `batchId`'s dir. */
  def batchCommitted(path: String, batchId: Long): Boolean =
    scanState(path)._2.contains(batchId)

  /** Commit one micro-batch idempotently; returns the version, or
    * None when the batch was already committed (replay) or empty.
    *
    * The absent-check alone is check-then-act: a replay twin can
    * commit this very batch BETWEEN our check and our commit, and
    * since our commit would build on the twin's manifest (no version
    * collision) the batch would be applied twice. So every commit
    * carries `expectedBase` = the high-water version of the SAME scan
    * that proved the batch absent — any intervening commit (twin or
    * not) turns ours into a CommitConflictException, and we re-scan
    * and either skip (twin won with OUR batch) or retry on the new
    * base.
    */
  def commitBatch(
      batch: DataFrame, path: String, batchId: Long): Option[Long] = {
    if (batch.isEmpty) None
    else {
      var attempts = 0
      while (attempts < 5) {
        val (base, ids) = scanState(path)
        if (ids.contains(batchId)) return None
        try {
          return Some(VersionedLake.commit(
            batch, path, overwrite = false,
            expectedBase = Some(base),
            dataDirPrefix = s"b$batchId-"))
        } catch {
          case _: VersionedLake.CommitConflictException =>
            attempts += 1 // someone committed since our scan — rescan
        }
      }
      throw new IllegalStateException(
        s"batch $batchId lost the commit race 5 times at $path — " +
          "a writer outside this sink is committing concurrently")
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
