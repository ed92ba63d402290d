package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed probe: 90% of rows share key 7
  private lazy val probe = spark.range(0, 2000)
    .select($"id", when($"id" % 10 === 0, $"id" % 5).otherwise(7L).as("k"))
  private lazy val build = Seq(
    (0L, "a"), (1L, "b"), (7L, "hot"), (99L, "unmatched"))
    .toDF("k", "v")

  test("salted inner join equals the plain join") {
    val plain = probe.join(build, Seq("k"))
      .select($"k", $"id", $"v").as[(Long, Long, String)].collect().sorted
    val salted = SkewJoin.saltedJoin(probe, build, Seq("k"), salts = 8)
      .select($"k", $"id", $"v").as[(Long, Long, String)].collect().sorted
    assert(salted === plain)
  }

  test("salted left join keeps unmatched probe rows exactly once") {
    val plain = probe.join(build, Seq("k"), "left")
      .select($"k", $"id", $"v")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
      .sorted
    val salted = SkewJoin.saltedJoin(probe, build, Seq("k"), 8, "left")
      .select($"k", $"id", $"v")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
      .sorted
    assert(salted === plain)
    assert(salted.length === probe.count())
  }

  test("right/full outer joins are rejected") {
    val e = intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(probe, build, Seq("k"), 8, "right")
    }
    assert(e.getMessage.contains("inner/left"))
  }

  test("duplicate build keys multiply matches exactly as the plain join") {
    val dupBuild = build.union(Seq((7L, "hot2")).toDF("k", "v"))
    val plain = probe.join(dupBuild, Seq("k")).count()
    val salted = SkewJoin.saltedJoin(probe, dupBuild, Seq("k"), 4).count()
    assert(salted === plain)
  }
}
