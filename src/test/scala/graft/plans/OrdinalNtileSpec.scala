package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OrdinalNtileSpec extends SparkSpec {
  import spark.implicits._

  test("withNtile matches the SQL NTILE window on an uneven split") {
    // 23 rows into 5 tiles: 23 = 5*4+3 -> sizes 5,5,5,4,4
    val df = (1L to 23L).map(i => (i, (i * 37) % 100)).toDF("id", "v")
    df.createOrReplaceTempView("ntile_in")
    val got = Ordinal.withNtile(df, Seq(col("v"), col("id")), 5, "tile")
      .select("id", "tile").as[(Long, Long)].collect().toMap
    val want = spark.sql(
      "SELECT id, NTILE(5) OVER (ORDER BY v, id) AS tile FROM ntile_in")
      .as[(Long, Int)].collect().toMap.map { case (k, v) => k -> v.toLong }
    assert(got == want)
  }

  test("withNtile handles k > n (each row its own tile) and k = 1") {
    val df = Seq((1L, 5L), (2L, 3L)).toDF("id", "v")
    val many = Ordinal.withNtile(df, Seq(col("v"), col("id")), 10, "tile")
      .select("id", "tile").as[(Long, Long)].collect().toMap
    assert(many == Map(2L -> 1L, 1L -> 2L)) // ordered by v
    val one = Ordinal.withNtile(df, Seq(col("v"), col("id")), 1, "tile")
      .select("tile").as[Long].collect().toSet
    assert(one == Set(1L))
  }

  test("withNtile never plans a single-partition global window") {
    val df = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_totalprice")
    val plan = Ordinal.withNtile(
      df, Seq(col("o_totalprice"), col("o_orderkey")), 10, "decile")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"found a window operator:\n$plan")
  }
}
