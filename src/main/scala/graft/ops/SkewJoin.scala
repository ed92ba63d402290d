package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join by key salting.
  *
  * A shuffled equi-join hashes both sides on the join key: one hot key
  * (a mega-customer, an empty-string sentinel, a bot user) lands its
  * entire volume in ONE reduce task and the stage runs at the speed of
  * that straggler. AQE's skew-join split (`spark.sql.adaptive.
  * skewJoin.enabled`) fixes the common cases at runtime and should stay
  * on; salting is the explicit fallback for the cases AQE cannot split
  * (a single key too large even for split sub-partitions, or
  * deterministic pre-partitioning needs).
  *
  * Mechanics: every row of the skewed (probe) side gets a uniform salt
  * in [0, salts); the build side is replicated once per salt value.
  * The join key becomes (key, salt), spreading each hot key over
  * `salts` reduce tasks. The salt only selects WHICH replica a probe
  * row meets — every build row exists at every salt — so the result
  * multiset is exactly the plain join's, for inner and left-outer
  * joins, regardless of the salt values drawn. (Right/full outer would
  * emit one null-padded row per REPLICA of an unmatched build row —
  * rejected.)
  *
  * Cost model: build-side bytes × `salts` extra shuffle volume in
  * exchange for hot-key parallelism `salts` — size `salts` to the
  * observed skew factor, and keep the build side the SMALLER input.
  */
object SkewJoin {

  private val SaltCol = "__graft_salt"

  /** @param probe    the large, skewed side (salted)
    * @param build    the smaller side (replicated `salts` times)
    * @param keys     equi-join key columns present in both frames
    * @param salts    replication factor (= hot-key parallelism)
    * @param joinType "inner" (default) or "left" / "left_outer"
    * @param saltOn   columns whose hash spreads a hot key over salts —
    *                 name a (nearly) unique row key here. Default: all
    *                 hashable probe columns. CAVEAT: rows identical in
    *                 every `saltOn` column share one salt, so a hot key
    *                 made of byte-identical duplicate rows does NOT
    *                 spread — pre-aggregate duplicates (count them)
    *                 before joining, or pass a synthetic unique column.
    */
  def saltedJoin(
      probe: DataFrame, build: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner",
      saltOn: Seq[String] = Nil): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val jt = joinType.toLowerCase.replace("_outer", "")
    require(jt == "inner" || jt == "left",
      s"salting preserves only inner/left joins, got: $joinType")
    // The salt must be DETERMINISTIC PER ROW, not rand(): if a shuffle
    // map task is recomputed after a fetch failure, rand() re-draws and
    // rows move between salt partitions mid-shuffle — the SPARK-23207
    // class of silent row loss/duplication. A hash of the row's columns
    // re-derives the same salt on any recompute. (MapType columns are
    // excluded from the default — Spark's hash expressions reject them.)
    val saltCols =
      if (saltOn.nonEmpty) saltOn
      else probe.schema.fields.filterNot(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]).map(_.name).toSeq
    require(saltCols.nonEmpty, "no hashable columns to salt on")
    val salted = probe.withColumn(SaltCol,
      pmod(xxhash64(saltCols.map(col): _*), lit(salts)).cast("int"))
    val replicated = build.withColumn(
      SaltCol, explode(lit((0 until salts).toArray)))
    salted.join(replicated, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
