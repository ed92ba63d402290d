package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Watermarked stream-stream joins (T6 north-star extension —
  * the reference is single-stream only).
  *
  * The canonical attribution shape: a left event joins right events
  * with the same key whose event time falls in
  * `[left.ts, left.ts + within]`. BOTH sides carry watermarks and the
  * join condition carries the time range, so Spark can bound each
  * side's state buffer and evict rows once the watermark passes —
  * without the range condition the state store grows with the whole
  * stream (the unbounded-state trap that kills long-running jobs).
  */
object StreamJoin {

  /** Inner event-time range join. `left`/`right` must share ONLY
    * `keyCol`; their timestamp columns must be named differently
    * (`ltsCol` vs `rtsCol`).
    */
  def attributionJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      ltsCol: String, rtsCol: String,
      watermark: String, within: String): DataFrame = {
    val l = left.withWatermark(ltsCol, watermark)
    val r = right.withWatermark(rtsCol, watermark)
    l.join(r,
      Seq(keyCol).map(k => l(k) === r(k)).reduce(_ && _) &&
        r(rtsCol) >= l(ltsCol) &&
        r(rtsCol) <= l(ltsCol) + expr(s"INTERVAL $within"))
      .drop(r(keyCol))
  }

  /** Left-outer variant: unmatched left rows are emitted with nulls
    * once the watermark guarantees no matching right row can still
    * arrive (emission is therefore delayed by the watermark — the
    * price of a complete answer on an unbounded stream).
    */
  def attributionJoinLeftOuter(
      left: DataFrame, right: DataFrame, keyCol: String,
      ltsCol: String, rtsCol: String,
      watermark: String, within: String): DataFrame = {
    val l = left.withWatermark(ltsCol, watermark)
    val r = right.withWatermark(rtsCol, watermark)
    l.join(r,
      Seq(keyCol).map(k => l(k) === r(k)).reduce(_ && _) &&
        r(rtsCol) >= l(ltsCol) &&
        r(rtsCol) <= l(ltsCol) + expr(s"INTERVAL $within"),
      "left_outer")
      .drop(r(keyCol))
  }
}
