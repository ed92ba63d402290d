package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** [EXT] Streaming distribution-drift monitor: every micro-batch is
  * scored against a STATIC reference corpus with [[graft.ext.Drift
  * .psi]] and the per-batch index is appended to a parquet log — the
  * "is today's crawl shaped like the corpus we trained on?" alarm,
  * running continuously. No reference equivalent.
  *
  * The reference frame is bound once at start (the standard
  * stream-static pattern); the batch side is whatever arrived in the
  * trigger. An EMPTY batch still logs a row — every reference bin
  * scores against the eps floor, i.e. maximal drift, which is the
  * right monitoring read for "input went dark" (a silent gap and a
  * broken upstream must not look alike in the log).
  *
  * Scale shape: the STATIC reference is binned ONCE at monitor start
  * ([[graft.ext.Drift.binCounts]], persisted) — a 100 TB training
  * corpus must not be rescanned every 1 s trigger. Per batch the
  * monitor then inherits [[graft.ext.Drift.psiFromBinnedRef]]'s
  * shape — one bin aggregate over the batch and a tiny bin join; the
  * parquet append is one row per trigger.
  */
object StreamDrift {

  def monitor(
      stream: DataFrame, reference: DataFrame, valueCol: String,
      width: Long, outDir: String, checkpointDir: String,
      triggerMs: Long = 1000L): StreamingQuery = {
    require(stream.isStreaming, "stream must be a streaming DataFrame")
    val refBins = graft.ext.Drift
      .binCounts(reference, valueCol, width, "n_ref").persist()
    refBins.count() // materialize before the first trigger
    val query =
      try {
        stream.writeStream
          .outputMode("append")
          .trigger(Trigger.ProcessingTime(triggerMs))
          .option("checkpointLocation", checkpointDir)
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            graft.ext.Drift
              .psiFromBinnedRef(refBins, batch, valueCol, width)
              .select(
                lit(batchId).as("batch_id"), col("psi_micro12"),
                col("n_bins"), col("n_ref"), col("n_cur"))
              .write.mode("append").parquet(outDir)
            ()
          }
          .start()
      } catch {
        case t: Throwable =>
          refBins.unpersist(blocking = false)
          throw t
      }
    // Release the reference cache when THIS query ends, however it
    // ends. awaitTermination on a dedicated daemon thread is
    // race-free where a StreamingQueryListener is not: a query that
    // fails before the listener registers would post its terminated
    // event to nobody and leak the cache for the session's lifetime.
    val reaper = new Thread(() => {
      try query.awaitTermination()
      catch { case _: Throwable => () }
      finally refBins.unpersist(blocking = false)
    }, s"graft-streamdrift-reaper-${query.id}")
    reaper.setDaemon(true)
    reaper.start()
    query
  }
}
