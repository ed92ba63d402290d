package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] As-of (backward) join: attach to every left row the latest
  * right row with the same key and `rightTs` <= `leftTs` — the
  * time-series enrichment primitive (sensor readings → latest
  * calibration, trades → latest quote, events → latest rollup).
  * DuckDB/kdb expose it as `ASOF JOIN`; Spark has no built-in.
  *
  * Implementation is the scalable union-merge form, NOT a range join:
  * tag both inputs, union them, and run ONE window pass per key ordered
  * by (ts, tag) taking the last non-null right-side value at or before
  * each row. Cost = one shuffle on the key + a per-key sorted scan —
  * the same shape as any windowed aggregation, with no pair
  * enumeration at any timestamp density (a naive `left.ts >= right.ts`
  * range join explodes to the full cross product per key before the
  * max-filter; a broadcast-asof only works while one side is tiny).
  *
  * Rows of the right frame sort BEFORE left rows at equal timestamps
  * (tag 0 < 1), giving the standard inclusive (`<=`) as-of semantics.
  *
  * Skew note: one key's full history lands in one task — the normal
  * window contract. If a single key's timeline outgrows a task, bucket
  * time into coarse epochs, run this per epoch, and carry each epoch's
  * last value forward into the next (one tiny per-epoch frame).
  */
object AsOf {

  /** Contract: `rightTs` must be unique per key (ties among right rows
    * would make "latest" placement-dependent), and right payload values
    * are assumed non-null — a null payload in a right row is looked
    * THROUGH to the previous right row by `last(ignoreNulls)`, not
    * propagated. Right rows with a NULL `rightTs` are dropped ("as of
    * null" matches nothing — the DuckDB ASOF semantics).
    *
    * @param left     probe side (keeps all rows; null-filled when no
    *                 earlier right row exists — LEFT as-of semantics)
    * @param right    reference side
    * @param keys     equi-join key columns (present in both frames)
    * @param leftTs   event-time column of `left`
    * @param rightTs  event-time column of `right`; dropped from the
    *                 output (its value at match time is `leftTs`-capped
    *                 history, not usually wanted — select it into a
    *                 payload column first if needed)
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    val payload = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    require(payload.nonEmpty, "right frame has no payload columns")
    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == leftTs)
    require(leftOnly.intersect(payload).isEmpty,
      s"column collision: ${leftOnly.intersect(payload).mkString(", ")}")

    // A null right timestamp sorts FIRST (asc = nulls first) and its
    // payload would back-fill every left row that precedes any real
    // right row — but "as of null" matches nothing in any as-of
    // semantics (DuckDB ASOF excludes it via comparison-with-null).
    // Drop such rows, matching Scd.scd2FromChangelog's null-ts policy.
    val taggedRight = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__tag")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__tag")) ++
        leftOnly.map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(taggedRight.unionByName(taggedLeft)) {
      (d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("__tag") === 1)
      .select(keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++
        leftOnly.map(col) ++ payload.map(col): _*)
  }

  /** The hot-key scale path of [[asOfJoin]], same semantics: window
    * partitions are (key, EPOCH) instead of a key's entire history, so
    * one key's timeline never lands in one task no matter how long it
    * runs. Three bounded steps:
    *
    *   1. within-epoch as-of fill — the [[asOfJoin]] union-window pass
    *      partitioned by (key, epoch): per-task work is one epoch of
    *      one key;
    *   2. per-(key, epoch) LAST rate (an aggregate — map-side
    *      combinable, output is keys × epochs rows, tiny);
    *   3. carry-in: for each (key, epoch), the last non-null rate from
    *      any STRICTLY earlier epoch — a window over the tiny frame of
    *      step 2 (gaps are fine: `last(ignoreNulls)` looks across
    *      missing epochs).
    *
    * An event's value = its within-epoch fill, else the carry-in.
    * Equivalent to [[asOfJoin]] for every input (spec-checked);
    * `epochSeconds` only tunes the partition granularity.
    *
    * Both timestamp columns must be TimestampType.
    */
  def asOfJoinEpochBucketed(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, epochSeconds: Long): DataFrame = {
    require(epochSeconds > 0, s"epochSeconds must be positive: $epochSeconds")
    val payload = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    require(payload.nonEmpty, "right frame has no payload columns")
    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == leftTs)
    require(leftOnly.intersect(payload).isEmpty,
      s"column collision: ${leftOnly.intersect(payload).mkString(", ")}")

    def epochOf(ts: Column): Column =
      floor(unix_micros(ts) / lit(epochSeconds * 1000000L)).cast("long")

    // same null-right-ts policy as [[asOfJoin]]: a null __epoch
    // partition would sort first in the carry window and back-fill
    // every later epoch
    val taggedRight = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__tag")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)
      .withColumn("__epoch", epochOf(col("__ts")))
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__tag")) ++
        leftOnly.map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
      .withColumn("__epoch", epochOf(col("__ts")))
    val unioned = taggedRight.unionByName(taggedLeft)

    // 1. within-epoch fill
    val wIn = Window.partitionBy((keys :+ "__epoch").map(col): _*)
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filledIn = payload.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"__in_$c", last(col(c), ignoreNulls = true).over(wIn))
    }

    // 2. per-(key, epoch) last rate — struct max orders by __ts first
    //    (rightTs is unique per key by the asOfJoin contract)
    val rateLast = taggedRight
      .groupBy((keys :+ "__epoch").map(col): _*)
      .agg(max(struct(col("__ts") +: payload.map(col): _*)).as("__l"))
      .select(keys.map(col) ++ Seq(col("__epoch")) ++
        payload.map(c => col(s"__l.$c").as(s"__el_$c")): _*)

    // 3. carry-in over strictly-earlier epochs, on the tiny epoch frame
    val allEpochs = unioned
      .select((keys :+ "__epoch").map(col): _*).distinct()
      .join(rateLast, keys :+ "__epoch", "left")
    val wCarry = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__epoch"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = payload.foldLeft(allEpochs) { (d, c) =>
      d.withColumn(s"__carry_$c",
        last(col(s"__el_$c"), ignoreNulls = true).over(wCarry))
    }.select(keys.map(col) ++ Seq(col("__epoch")) ++
      payload.map(c => col(s"__carry_$c")): _*)

    filledIn
      .filter(col("__tag") === 1)
      .join(carry, keys :+ "__epoch", "left") // 1:1 — carry is unique per (key, epoch)
      .select(keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++
        leftOnly.map(col) ++
        payload.map(c =>
          coalesce(col(s"__in_$c"), col(s"__carry_$c")).as(c)): _*)
  }
}
