package graft.ops

import java.sql.Timestamp
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property check of the first-live-bin reporting lemma behind
  * [[RangeJoin.intervalOverlapPairs]]: for random same-key interval
  * sets (boundary-touching, nested, duplicated, inverted), the binned
  * equi-join must return EXACTLY the quadratic reference pair set —
  * once per pair, regardless of how many bins a pair shares.
  */
class RangeJoinPropSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  // intervals on a coarse integer grid (hours), many bin-boundary
  // alignments; bin width 1 day so pairs span 0..several shared bins
  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private val gen: Gen[List[(Long, Long, Long, Long)]] =
    Gen.listOfN(25, for {
      k <- Gen.chooseNum(1L, 3L)
      s <- Gen.chooseNum(0L, 200L)
      len <- Gen.chooseNum(-12L, 96L) // negatives: inverted intervals
    } yield (k, s, s, s + len)).map(_.zipWithIndex.map {
      case ((k, _, s, e), i) => (k, i.toLong, s, e)
    })

  test("intervalOverlapPairs equals the quadratic reference") {
    forAllSeeded(gen, 8) { rows =>
      val df = rows.map { case (k, id, s, e) =>
        (k, id, new Timestamp(base + s * 3600000L),
          new Timestamp(base + e * 3600000L))
      }.toDF("k", "id", "s", "e")
      val got = RangeJoin.intervalOverlapPairs(df, "k", "id", "s", "e", 86400L)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val want = (for {
        (k1, i1, s1, e1) <- rows if e1 > s1
        (k2, i2, s2, e2) <- rows if e2 > s2
        if k1 == k2 && i1 < i2 && s1 < e2 && s2 < e1
      } yield (i1, i2)).toSet
      assert(got === want, s"rows: $rows")
    }
  }
}
