package graft

import org.apache.spark.sql.functions._

/** Pins the exact Spark xxhash64 outputs the [[XxSql]] DuckDB oracle
  * emulates (string seed-42, int-literal chain, long chain). If a
  * Spark upgrade ever changes these, the fast-dedup oracles must be
  * revisited — this spec makes that loud. The cross-engine equality
  * itself is proven by the driver gate (exact_check on
  * q_dedup_minhash_fast / q_dedup_simhash_fast).
  */
class XxSqlSpec extends SparkSpec {
  import spark.implicits._

  test("spark xxhash64 vectors are the ones the SQL emulation models") {
    val r = Seq(("hello", 0L)).toDF("s", "i")
      .select(
        xxhash64(col("s")).as("h1"),
        xxhash64(col("s"), lit(0)).as("h2"),
        xxhash64(col("s"), lit(7)).as("h3"),
        xxhash64(lit(1L), lit(2L), lit(3L), lit(4L)).as("h4"),
        xxhash64(lit("")).as("h5"),
        xxhash64(lit("x" * 31)).as("h6"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r._1 === -4367754540140381902L)
    assert(r._2 === -4898577102048553803L)
    assert(r._3 === -4052038839435053954L)
    assert(r._4 === -8535427462902352275L)
    assert(r._5 === -7444071767201028348L)
    assert(r._6 === -1716462135722163746L)
  }

  test("oracle SQL generators produce bounded, well-formed statements") {
    val mh = XxSql.minHashFastOracleSql(0.5)
    val sh = XxSql.simHashFastOracleSql(6)
    assert(mh.contains("MATERIALIZED") && sh.contains("MATERIALIZED"))
    assert(mh.length < 200000 && sh.length < 200000,
      s"oracle SQL unexpectedly large: ${mh.length}/${sh.length}")
  }
}
