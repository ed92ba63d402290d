package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Streaming deduplication — the continuous-ingest analog of
  * [[graft.ext.Dedup.exact]] for a training-data pipeline that receives
  * documents as an unbounded stream. No reference equivalent (the
  * reference's dedup is its `recently_processed` FILE set,
  * `pipeline.py:362-372`; this deduplicates CONTENT).
  *
  * Both forms key state on a 16-byte md5 digest of the text rather than
  * the text itself, so per-key state stays constant-size no matter how
  * large documents get — the same shuffle-shrinking trick as
  * [[graft.ext.Dedup.exactByDigest]].
  */
object StreamDedup {

  /** Global exact dedup: emits the FIRST occurrence of each distinct
    * text, suppresses every later copy, forever.
    *
    * State grows with the number of distinct documents (16 B keys —
    * ~1.6 GB per 100 M distinct docs, spread across the cluster's state
    * stores). Use [[exactWithinWatermark]] when re-emits outside a
    * bounded window are acceptable and state must be bounded by time.
    */
  def exact(docs: DataFrame, textCol: String): DataFrame =
    docs
      // The shared 16-byte binary digest (same expression as the batch
      // operators — incremental dedup depends on the match).
      // MIGRATION NOTE: this changed the dedup state key type (string →
      // binary). A stream restarted from a checkpoint written by the
      // hex-string version fails the state schema check — start such
      // upgrades from a fresh checkpoint.
      .withColumn("__fp", graft.ext.Dedup.textDigest(col(textCol)))
      .dropDuplicates("__fp")
      .drop("__fp")

  /** Watermark-bounded exact dedup: duplicates arriving within the
    * watermark of the first copy are suppressed; state for a digest is
    * dropped once the watermark passes its first-seen event time, so
    * total state is bounded by the distinct-docs-per-watermark-window
    * rate instead of stream lifetime.
    *
    * @param tsCol     event-time column the watermark tracks
    * @param watermark e.g. "10 minutes" — the dedup horizon
    */
  def exactWithinWatermark(
      docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__fp", graft.ext.Dedup.textDigest(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
