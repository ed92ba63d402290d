package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BitExprsSpec extends SparkSpec {
  import spark.implicits._

  test("zOrder2 interleaves bits: x even positions, y odd positions") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L))
      .toDF("x", "y")
      .select(col("x"), col("y"), BitExprs.zOrder2(col("x"), col("y"), 16).as("z"))
    val m = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((0L, 0L)) == 0L)
    assert(m((1L, 0L)) == 1L)  // x bit 0 -> z bit 0
    assert(m((0L, 1L)) == 2L)  // y bit 0 -> z bit 1
    assert(m((3L, 3L)) == 15L) // 0b1111
    // x=5 (101), y=2 (010): z = 1<<0 | 0<<1 | 0<<2 | 1<<3 | 1<<4 = 25
    assert(m((5L, 2L)) == 25L)
  }

  test("zOrder2 masks inputs beyond the bit width instead of overflowing") {
    val z = Seq((65536L + 3L, 0L)).toDF("x", "y")
      .select(BitExprs.zOrder2(col("x"), col("y"), 16)).as[Long].head()
    // 65536 is bit 16 — masked away; only the low 3 survives
    assert(z == Seq((3L, 0L)).toDF("x", "y")
      .select(BitExprs.zOrder2(col("x"), col("y"), 16)).as[Long].head())
  }

  test("z-ordered layout keeps both dimensions clustered (locality beats linear sort)") {
    // 32x32 grid; compare per-chunk spread of y under z-order vs x-major
    val pts = for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong)
    val df = pts.toDF("x", "y")
      .select(col("x"), col("y"), BitExprs.zOrder2(col("x"), col("y"), 5).as("z"))
    def chunkSpread(sorted: Seq[(Long, Long)]): Double =
      sorted.grouped(64).map { c =>
        val ys = c.map(_._2)
        (ys.max - ys.min).toDouble
      }.sum
    val byZ = df.orderBy("z").select("x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val byX = df.orderBy("x", "y").select("x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // within same-size chunks (files), z-order bounds the y-range a
    // filter would have to scan; x-major leaves it at full width
    assert(chunkSpread(byZ) < chunkSpread(byX))
  }
}
