package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** [EXT] Event-time streaming aggregation (T6 north-star extension — the
  * reference has no watermarks/windows; its aggregation is per-file
  * batch only, `pipeline.py:186-208`).
  *
  * Designed for an unbounded `events`-shaped stream
  * (`ts, user_id, event_type, value`):
  *   - [[tumbling]] / [[sliding]]: watermarked windowed aggregates —
  *     Spark keeps per-(window, key) state, drops it once the watermark
  *     passes, so state is bounded by (windows in flight × keys), not by
  *     stream length;
  *   - [[sessionize]]: gap-based sessions via
  *     `flatMapGroupsWithState` — the custom-state escape hatch for
  *     semantics window functions can't express.
  */
object WindowedAgg {

  /** Tumbling event-time window aggregation with late-data tolerance. */
  def tumbling(
      events: DataFrame,
      window_ : String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding windows (e.g. 1 h window every 15 min). */
  def sliding(
      events: DataFrame,
      window_ : String = "1 hour",
      slide: String = "15 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  final case class Event(ts: Timestamp, user_id: Long, value: Double)
  final case class SessionState(
      start: Long, lastSeen: Long, n: Long, sum: Double)
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  /** Gap-based sessionization: a user's session closes after
    * `gapMs` of inactivity (processing-time timeout — each key's state
    * is one small struct, evicted on emit).
    *
    * NOTE: run the resulting query with a real trigger
    * (`Trigger.ProcessingTime(...)` or `Trigger.AvailableNow()`). The
    * default as-fast-as-possible trigger busy-loops evaluating pending
    * ProcessingTimeTimeouts on empty batches.
    */
  def sessionize(
      spark: SparkSession, events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start),
              new Timestamp(s.lastSeen), s.n, s.sum))
          } else {
            // Null timestamps cannot be sessionized and would NPE the
            // sort — a poison record must not kill the query forever
            // (the checkpoint would replay it on every restart).
            val sorted = rows.filter(_.ts != null).toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  // A LATE cross-batch event (t < lastSeen) joins the
                  // session but must never move lastSeen BACKWARDS
                  // (the next gap test would close the session against
                  // a stale clock and emit session_end earlier than
                  // events already counted) — and it may extend the
                  // session start earlier.
                  cur = Some(s.copy(
                    start = math.min(s.start, t),
                    lastSeen = math.max(s.lastSeen, t),
                    n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start),
                    new Timestamp(s.lastSeen), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Declarative event-time sessionization: Spark's native
    * `session_window` (gap-merged windows) + watermark. Prefer this
    * over [[sessionize]] when the per-session result is expressible as
    * standard aggregates — sessions close by EVENT time (watermark),
    * not a processing-time timeout, so results are replayable and
    * backfill-safe; the state store merges overlapping windows
    * per (key, session) and evicts on watermark passage.
    */
  def sessionWindows(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
}
