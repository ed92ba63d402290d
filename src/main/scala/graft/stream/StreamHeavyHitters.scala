package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** [EXT] Streaming heavy hitters — continuous "what are the hot keys"
  * (domains flooding the crawl, users hammering the API) with BOUNDED
  * state, via the SpaceSaving sketch (Metwally et al. '05): m counters
  * per shard; an untracked arrival evicts the minimum counter and
  * inherits its count as its error bound. Guarantees (classic, per
  * shard): every true count ≥ `count − error`; any key with true
  * frequency > N/m is tracked; Σcounts = N exactly (count
  * conservation). [[graft.ext.Sketches.countMin]] answers point
  * frequency queries; this maintains the TOP-SET itself, streaming.
  *
  * Distribution: keys shard by portable md5 bucket —
  * `flatMapGroupsWithState` holds ONE SpaceSaving summary per bucket
  * (m entries, a plan constant), so total state is buckets × m
  * regardless of stream length, and a key's counters live in exactly
  * one shard (shard summaries union into a valid global sketch; the
  * per-shard guarantee holds against the shard's own N).
  *
  * Determinism: within a micro-batch, arrivals are pre-counted per
  * key and applied in ascending key order — the emitted summary
  * depends on batch CONTENT, not arrival order (the [[StreamBudget]]
  * discipline). Output (append): one row per key touched this batch
  * AND STILL TRACKED at batch end, with its post-batch (count,
  * error) — emitting per-update rows would leak a stale row for a
  * key inserted then evicted WITHIN the batch, and a downstream
  * latest-row-per-key view would double-count its inherited total.
  * Downstream keeps the latest row per key (count is monotone);
  * rows of keys evicted in LATER batches linger by construction of
  * an append stream — treat the view as the sketch's over-approximate
  * candidate set (the classic SpaceSaving read), not an exact top-m.
  *
  * Null keys are dropped (a hot "null" is upstream corruption, and a
  * null would poison-pill the query: the hash NPEs, the batch fails,
  * and the checkpoint replays it forever).
  */
object StreamHeavyHitters {

  final case class Item(key: String, n: Long)
  final case class Keyed(bucket: Long, key: String, n: Long)
  final case class Summary(keys: Array[String], counts: Array[Long],
      errors: Array[Long])
  final case class Hit(bucket: Long, key: String, count: Long, error: Long)

  /** `items` must carry a string `key` column (pre-aggregate a weight
    * by repeating rows or summing upstream; one row = one occurrence).
    */
  def track(
      items: DataFrame, m: Int, buckets: Int = 64): Dataset[Hit] = {
    require(m >= 1, s"m must be >= 1: $m")
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val spark = items.sparkSession
    import spark.implicits._
    items.selectExpr("key")
      .filter("key IS NOT NULL")
      .as[String]
      .map(k => Keyed(
        graft.functions.Md5Ops.prefix60(
          k.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          % buckets, k, 1L))
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[Summary, Hit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Long, it: Iterator[Keyed], state) =>
          val s = state.getOption.getOrElse(
            Summary(Array.empty, Array.empty, Array.empty))
          val keys = scala.collection.mutable.ArrayBuffer(s.keys: _*)
          val counts = scala.collection.mutable.ArrayBuffer(s.counts: _*)
          val errors = scala.collection.mutable.ArrayBuffer(s.errors: _*)
          // batch content, order-free: per-key totals, applied in
          // ascending key order
          val batch = it.toSeq.groupBy(_.key).view
            .mapValues(_.map(_.n).sum).toSeq.sortBy(_._1)
          batch.foreach { case (k, add) =>
            val i = keys.indexOf(k)
            if (i >= 0) {
              counts(i) += add
            } else if (keys.length < m) {
              keys += k; counts += add; errors += 0L
            } else {
              // evict the minimum counter (ties: smallest key — a
              // total order, so eviction is deterministic)
              var mi = 0
              var idx = 1
              while (idx < counts.length) {
                if (counts(idx) < counts(mi) ||
                  (counts(idx) == counts(mi) && keys(idx) < keys(mi))) mi = idx
                idx += 1
              }
              val inherited = counts(mi)
              keys(mi) = k
              errors(mi) = inherited
              counts(mi) = inherited + add
            }
          }
          state.update(Summary(keys.toArray, counts.toArray, errors.toArray))
          // Emit from the FINAL state: a key inserted then evicted
          // within this batch emits nothing (a per-update row would be
          // stale the moment it was evicted — see object doc).
          val at = keys.zipWithIndex.toMap
          batch.flatMap { case (k, _) =>
            at.get(k).map(i => Hit(bucket, k, counts(i), errors(i)))
          }.iterator
      }
  }
}
