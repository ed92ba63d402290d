package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** [EXT] Stateful streaming sessionization — the continuous analog of
  * [[graft.ext.Analytics.sessionizeBatch]]'s gaps-and-islands: a
  * user's events belong to one session until a silence longer than
  * `gap`, at which point the session CLOSES and is emitted exactly
  * once. No reference equivalent (the reference has no stateful
  * streaming; north-star extension).
  *
  * Engine mapping: `KeyValueGroupedDataset.flatMapGroupsWithState`
  * with an EVENT-TIME timeout —
  *   - state per user is one open session (id, start, end, n, Σvalue):
  *     constant-size, independent of session length;
  *   - each micro-batch's events for a user are folded in
  *     (ts, event_id) order: an event within `gap` of the open
  *     session's end extends it, a later one closes it (emitted NOW,
  *     in the same batch) and opens the next;
  *   - the timeout timestamp is re-armed to session_end + gap after
  *     every batch; when the WATERMARK passes it, Spark calls the
  *     function with `hasTimedOut` and the idle session is emitted and
  *     its state dropped. State lifetime is therefore bounded by the
  *     gap, not by stream lifetime — at 100 TB/day the state store
  *     holds only currently-active users.
  *
  * Parity contract with the batch sessionizer: identical sessions and
  * 1-based per-user session ids whenever events arrive in event-time
  * order ACROSS micro-batches (in-batch disorder is sorted away).
  * A late event landing inside the still-open session's gap merges
  * correctly (and may retro-extend session_start); one arriving after
  * its true session closed starts a fresh session instead — the
  * watermark is the knob that bounds how much such disorder is
  * admitted at all.
  *
  * Output timestamps are session_start / session_end; `sum_value` is
  * rounded to 4 dp at emit (the batch operator's convention).
  */
object StreamSession {

  final case class Ev(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  final case class OpenSession(
      sid: Long, startMs: Long, endMs: Long, n: Long, sum: Double)
  final case class ClosedSession(
      user_id: Long, session_id: Long,
      session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  private def close(uid: Long, s: OpenSession): ClosedSession =
    ClosedSession(uid, s.sid, new Timestamp(s.startMs), new Timestamp(s.endMs),
      s.n, math.rint(s.sum * 1e4) / 1e4)

  /** `events` must carry (user_id, event_id, ts, value); emits one row
    * per CLOSED session in append mode.
    *
    * @param gapMinutes session gap: silence that splits sessions
    * @param watermark  max admitted event-time disorder, e.g. "10 minutes"
    */
  def sessionize(
      events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    events.selectExpr("user_id", "event_id", "ts", "value")
      .withWatermark("ts", watermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(close(uid, s))
          } else {
            val evs = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            evs.foreach { e =>
              val t = e.ts.getTime
              cur = cur match {
                case Some(s) if t <= s.endMs + gapMs =>
                  Some(s.copy(
                    startMs = math.min(s.startMs, t),
                    endMs = math.max(s.endMs, t),
                    n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed ::= close(uid, s)
                  Some(OpenSession(s.sid + 1, t, t, 1L, e.value))
                case None =>
                  Some(OpenSession(1L, t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.reverse.iterator
          }
      }
  }
}
