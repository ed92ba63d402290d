package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val child = Seq(
    (1L, 1, Some(10.0)), (1L, 2, Some(-5.0)), (2L, 1, None),
    (2L, 1, Some(3.0)), (3L, 1, Some(7.0)))
    .toDF("k", "line", "v")

  test("rowChecks: one row per predicate, exact counts, one agg pass") {
    val out = Quality.rowChecks(child, Seq(
      "v_present" -> col("v").isNull,
      "v_positive" -> (col("v").isNull || col("v") <= 0)))
      .as[(String, Long, Long, Double)].collect()
      .map { case (k, n, v, p) => k -> ((n, v, p)) }.toMap
    assert(out("v_present") === ((5L, 1L, 0.8)))
    assert(out("v_positive") === ((5L, 2L, 0.6)))
  }

  test("uniqueCheck counts rows in excess of one per key") {
    val out = Quality.uniqueCheck(child, "pk", Seq("k", "line"))
      .as[(String, Long, Long, Double)].head()
    // (2,1) appears twice -> 1 excess row over 4 distinct keys
    assert(out === (("pk", 5L, 1L, 0.8)))
  }

  test("fkCheck: unmatched and null child keys are orphans; no fan-out") {
    val parent = Seq(1L, 2L).toDF("pk")
    val orphans = Seq((Some(1L), 1, Some(1.0)), (Some(9L), 1, Some(1.0)),
      (Option.empty[Long], 1, Some(1.0)))
      .toDF("k", "line", "v")
    val out = Quality.fkCheck(orphans, "k", parent, "pk", "fk")
      .as[(String, Long, Long, Double)].head()
    assert(out._2 === 3L && out._3 === 2L) // 9 and null are orphans
    // duplicate parent keys must not multiply child rows
    val dupParent = Seq(1L, 1L, 2L).toDF("pk")
    val n = Quality.fkCheck(child, "k", dupParent, "pk", "fk")
      .select("n_rows").as[Long].head()
    assert(n === 5L)
  }

  test("kAnonymityAudit: classes below k with exact exposure shares") {
    val people = Seq(
      // (nation, segment): class sizes a/x=3, a/y=1, b/x=2
      ("a", "x"), ("a", "x"), ("a", "x"),
      ("a", "y"),
      ("b", "x"), ("b", "x"))
      .toDF("nation", "segment")
    val out = Quality.kAnonymityAudit(people, Seq("nation", "segment"), 3L)
      .as[(String, String, Long, Double)].collect()
      .map { case (n, s, c, e) => (n, s) -> ((c, e)) }.toMap
    // only classes of size < 3 are reported
    assert(out.keySet === Set(("a", "y"), ("b", "x")))
    assert(out(("a", "y")) === ((1L, 1.0 / 6.0)))
    assert(out(("b", "x")) === ((2L, 2.0 / 6.0)))
  }

  test("kAnonymityAudit: fully k-anonymous table reports nothing") {
    val ok = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("nation", "segment")
    assert(Quality.kAnonymityAudit(ok, Seq("nation", "segment"), 2L)
      .count() === 0L)
  }

  test("benfordAudit: exact digit extraction, Benford expectations") {
    import org.apache.spark.sql.functions.col
    // digits: 1 x4 (1.5, 10, 150, 1999.99), 9 x1 (900); 0.5 excluded
    val df = Seq(1.5, 10.0, 150.0, 1999.99, 900.0, 0.5).toDF("v")
    val out = Quality.benfordAudit(df, "v")
      .select("digit", "n_obs", "p_obs", "p_benford")
      .as[(Int, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet === Set(1, 9))
    assert(out(1)._1 === 4L && out(1)._2 === 0.8)
    assert(out(9)._1 === 1L && out(9)._2 === 0.2)
    assert(out(1)._3 === math.rint(math.log10(2.0) * 1e6) / 1e6) // 0.30103
    // digit 9 expectation: log10(10/9)
    assert(math.abs(out(9)._3 - math.log10(10.0 / 9.0)) < 1e-6)
  }

  test("audit unions reports; suite order preserved") {
    val rep = Quality.audit(Seq(
      Quality.rowChecks(child, Seq("a" -> col("v").isNull)),
      Quality.uniqueCheck(child, "b", Seq("k", "line"))))
    assert(rep.columns.toSeq ===
      Seq("check_name", "n_rows", "n_violations", "pass_rate"))
    assert(rep.count() === 2L)
  }

  test("lDiversityAudit: homogeneous classes flagged even when " +
    "k-anonymous; diverse classes pass") {
    val rows = Seq(
      // class (a,x): 4 members, all same diagnosis -> 1 distinct
      ("a", "x", "flu"), ("a", "x", "flu"), ("a", "x", "flu"),
      ("a", "x", "flu"),
      // class (b,y): 3 members, 3 distinct -> diverse
      ("b", "y", "flu"), ("b", "y", "cold"), ("b", "y", "cough"))
      .toDF("zip", "age", "diag")
    val out = Quality.lDiversityAudit(rows, Seq("zip", "age"), "diag", 2L)
      .as[(String, String, Long, Long)].collect()
    assert(out.toList === List(("a", "x", 4L, 1L)))
    // the homogeneous class is k-anonymous at k=3 — k alone missed it
    assert(Quality.kAnonymityAudit(
      rows, Seq("zip", "age"), 3L).count() === 0L)
  }
}
