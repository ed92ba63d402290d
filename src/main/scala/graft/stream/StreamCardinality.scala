package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** [EXT] Streaming distinct-count monitor — the continuous analog of
  * [[graft.ext.Sketches.approxDistinct]]: per group, a HyperLogLog
  * register array held in keyed state, updated per micro-batch,
  * emitting the refreshed estimate each trigger. "How many distinct
  * users/documents/URLs have we EVER seen per source?" with state that
  * never grows past 2^b bytes per group — an exact streaming distinct
  * would hold every key forever ([[StreamDedup.exact]]'s trade-off,
  * deliberately inverted).
  *
  * Stream/batch consistency is EXACT, not approximate-equal: the same
  * md5-prefix hash, the same integer register summary, the same
  * estimator formula evaluated in the same operation order — a batch
  * [[graft.ext.Sketches.approxDistinct]] over the stream's full
  * history returns the bit-identical estimate (asserted in the spec).
  * That is the property that lets a backfilled batch sketch and the
  * live streaming sketch reconcile without a tolerance band.
  */
object StreamCardinality {

  final case class Estimate(group: String, approx_distinct: Double)
  final case class GV(g: String, v: String)

  /** Scala mirror of [[graft.functions.HashExprs.md5Prefix60]]:
    * first 15 hex chars of md5(UTF-8 bytes) as a 60-bit long.
    */
  private[graft] def md5Prefix60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(8).map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** The shared estimator: exact-integer register summary → raw HLL
    * estimate → linear-counting fallback → 4 dp HALF_UP round. Mirrors
    * the batch column expressions term for term (same literal
    * constants, same operation order — IEEE doubles agree exactly).
    */
  private[graft] def estimate(m: Int, maxRank: Int, regs: Array[Byte]): Double = {
    // m-specific Flajolet constants below m=128 — keep in sync with
    // Sketches.approxDistinct (bit-equality is spec-asserted).
    val alpha = m match {
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var sScaled = 0L
    var zeros = 0
    var i = 0
    while (i < m) {
      sScaled += 1L << (maxRank - regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m.toDouble * m.toDouble *
      math.pow(2.0, maxRank) / sScaled.toDouble
    val e =
      if (raw <= 2.5 * m && zeros > 0)
        m.toDouble * math.log(m.toDouble / zeros)
      else raw
    BigDecimal(e).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Per-group streaming HLL. Update output mode: every trigger emits
    * the refreshed estimate for each group that received rows.
    *
    * Scale shape: state is a fixed 2^b-byte register array per group
    * (b=9 ⇒ 512 B); updates are in-place maxes, so a micro-batch of
    * any size folds into state in one pass. Unlike a streaming
    * `approx_count_distinct` aggregate, the register STATE is the
    * contract: checkpointed, restart-safe, and reconcilable against
    * batch backfills (see object doc).
    */
  def approxDistinct(
      spark: SparkSession, df: DataFrame,
      groupCol: String, valueCol: String, b: Int = 9): Dataset[Estimate] = {
    require(b >= 5 && b <= 12, s"b in [5,12] for byte-array state: $b")
    import spark.implicits._
    val m = 1 << b
    val wBits = 60 - b
    val maxRank = wBits + 1
    df
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
      .as[GV]
      .groupByKey(_.g)
      .mapGroupsWithState[Array[Byte], Estimate](GroupStateTimeout.NoTimeout) {
        (g, rows, state) =>
          val regs = state.getOption.getOrElse(new Array[Byte](m))
          rows.foreach { r =>
            val h = md5Prefix60(r.v)
            val bucket = (h >>> wBits).toInt
            val w = h & ((1L << wBits) - 1)
            val rank =
              if (w == 0L) maxRank
              else maxRank - (64 - java.lang.Long.numberOfLeadingZeros(w))
            if (rank > regs(bucket)) regs(bucket) = rank.toByte
          }
          state.update(regs)
          Estimate(g, estimate(m, maxRank, regs))
      }
  }
}
