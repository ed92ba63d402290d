package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join via time binning — the scale path for
  * point-in-interval joins.
  *
  * A raw `p.ts >= i.start AND p.ts < i.end` predicate has no equality
  * component, so Spark can only plan a broadcast nested loop — O(|P|·|I|)
  * pair evaluations, the classic 100 TB killer. Binning restores an
  * equi-join: every interval explodes to the fixed-width time bins it
  * overlaps (⌈len/bin⌉+1 rows, a small constant when bin width ≈
  * interval length), points map to exactly one bin, and the join runs
  * as a shuffled/broadcast HASH join on the bin id with the exact range
  * predicate as a post-filter. Same answer, linear shuffle.
  *
  * Bin ids are epoch-microsecond integer divisions — exact arithmetic,
  * no float rounding at bucket boundaries.
  */
object RangeJoin {

  /** Join `points` rows onto every `intervals` row whose
    * `[startTs, endTs)` half-open window contains the point's `tsCol`.
    * Output: all interval columns + all point columns (inner join —
    * aggregate and re-join for left semantics, keeping the wide join
    * lean).
    */
  def binnedIntervalJoin(
      points: DataFrame, tsCol: String,
      intervals: DataFrame, startTs: String, endTs: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    val binMicros = binSeconds * 1000000L
    // Integer `div`, never float `/`: epoch-micros (~1.7e15) sit close
    // enough to 2^53 that double division can misround a bin boundary.
    // The timestamp cast lifts TIMESTAMP_NTZ columns (parquet "local"
    // timestamps) into the session zone — sessions run UTC
    // (Tables.prepare), so the mapping is deterministic.
    def epochMicros(c: String) = s"unix_micros(cast($c as timestamp))"
    val p = points.withColumn(
      "__bin", expr(s"${epochMicros(tsCol)} div ${binMicros}L"))
    // Half-open end: the last covered bin is the one holding end-1µs,
    // so an interval ending exactly on a bin boundary does not explode
    // into a bin it cannot match.
    //
    // Empty/inverted intervals (end <= start) are dropped BEFORE the
    // explode: they can match nothing under the half-open predicate,
    // but sequence(start, stop) with stop < start would count DOWN
    // (default step -1) — one badly-inverted row (end years before
    // start) fans out into millions of spurious bin rows, exactly the
    // blow-up this operator exists to avoid.
    val i = intervals
      .filter(col(endTs) > col(startTs))
      .withColumn(
        "__bin",
        explode(sequence(
          expr(s"${epochMicros(startTs)} div ${binMicros}L"),
          expr(s"(${epochMicros(endTs)} - 1) div ${binMicros}L"))))
    i.join(p,
        i("__bin") === p("__bin") &&
          p(tsCol) >= i(startTs) && p(tsCol) < i(endTs))
      .drop("__bin")
  }

  /** Interval×interval overlap pairs within a partition key — "which
    * of this customer's promotion windows collide?", session-overlap
    * detection, double-booking audits. Output one row per unordered
    * pair (id_a < id_b) of same-key intervals whose half-open windows
    * intersect, with the intersection bounds.
    *
    * Scale shape: both sides explode to fixed-width bins and equi-join
    * on (key, bin) — co-partitioned self-join, never a nested loop. A
    * pair overlapping several bins would surface once per shared bin;
    * instead of a distinct (a second full shuffle of the pair stream),
    * each pair is emitted ONLY in the bin containing the later of the
    * two starts — the first bin where both are live. One copy per
    * pair, zero dedup shuffle (the standard reporting trick from
    * spatial grid joins).
    *
    * Inverted/empty intervals are dropped before the explode (see
    * [[binnedIntervalJoin]] — descending `sequence` blow-up).
    */
  def intervalOverlapPairs(
      intervals: DataFrame, keyCol: String, idCol: String,
      startTs: String, endTs: String, binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    val binMicros = binSeconds * 1000000L
    def side(tag: String) = {
      val d = intervals
        .filter(col(endTs) > col(startTs))
        .select(
          col(keyCol).as("__k"),
          col(idCol).as(s"id_$tag"),
          expr(s"unix_micros(cast($startTs as timestamp))").as(s"__s_$tag"),
          expr(s"unix_micros(cast($endTs as timestamp))").as(s"__e_$tag"))
      d.withColumn("__bin",
        explode(sequence(
          expr(s"__s_$tag div ${binMicros}L"),
          expr(s"(__e_$tag - 1) div ${binMicros}L"))))
    }
    side("a").join(side("b"), Seq("__k", "__bin"))
      .filter(
        col("id_a") < col("id_b") &&
          col("__s_a") < col("__e_b") && col("__s_b") < col("__e_a") &&
          col("__bin") === expr(
            s"greatest(__s_a, __s_b) div ${binMicros}L"))
      .select(
        col("__k").as(keyCol),
        col("id_a"), col("id_b"),
        timestamp_micros(greatest(col("__s_a"), col("__s_b")))
          .as("overlap_start"),
        timestamp_micros(least(col("__e_a"), col("__e_b")))
          .as("overlap_end"))
  }

  /** Per-interval point count with left semantics (intervals matching
    * nothing report 0): the heavy binned join stays inner and partial-
    * aggregates down to one row per interval key BEFORE the cheap
    * left join back onto the interval table.
    */
  def intervalPointCount(
      points: DataFrame, tsCol: String,
      intervals: DataFrame, keyCol: String, startTs: String, endTs: String,
      binSeconds: Long): DataFrame = {
    // Pre-aggregate the point side to (distinct ts -> multiplicity)
    // BEFORE the join: the range predicate only sees the timestamp, so
    // duplicate timestamps are pure fan-out in the pair join. On dense
    // event streams (many points per instant — here: date-grain
    // timestamps) this shrinks the joined side by orders of magnitude;
    // the same fact-side pre-aggregation shape as the revenue join.
    val distinctPts = points
      .groupBy(col(tsCol)).agg(count(lit(1)).as("__mult"))
    val joined = binnedIntervalJoin(
      distinctPts, tsCol,
      intervals.select(keyCol, startTs, endTs), startTs, endTs, binSeconds)
    val counts = joined.groupBy(col(keyCol)).agg(sum(col("__mult")).as("cnt"))
    intervals.select(keyCol)
      .join(counts, Seq(keyCol), "left")
      .select(col(keyCol), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }
}
