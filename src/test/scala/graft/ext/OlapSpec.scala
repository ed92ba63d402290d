package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class OlapSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("rollupSum emits detail, subtotal, and grand-total levels in one pass") {
    val li = graft.Tables.lineitem(spark, dir)
    val out = Olap.rollupSum(li, Seq("l_returnflag", "l_linestatus"), "l_extendedprice")
    val rows = out.collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    // gid 0 = (flag, status) detail; 1 = per-flag subtotal; 3 = grand total
    assert(byGid.keySet == Set(0L, 1L, 3L))
    assert(byGid(3L).length == 1)
    val grand = byGid(3L).head
    assert(grand.isNullAt(grand.fieldIndex("l_returnflag")))
    assert(grand.getAs[Long]("cnt") == li.count())
    // detail counts roll up exactly to the grand total
    assert(byGid(0).map(_.getAs[Long]("cnt")).sum == grand.getAs[Long]("cnt"))
    // one Expand + one aggregate: no join, no second scan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    assert(!plan.toLowerCase.contains("join"))
  }

  test("pivotSum pins values at plan time and sums exactly") {
    val orders = graft.Tables.orders(spark, dir)
    val out = Olap.pivotSum(
      orders, date_format(col("o_orderdate"), "yyyy-MM"), "month",
      "o_orderstatus", Seq("O", "F", "P"), "o_totalprice")
    assert(out.columns.toSeq == Seq("month", "sum_o", "sum_f", "sum_p"))
    // total across pivot cells == straight sum (decimal-exact, so ==)
    val cells = out.agg(
      sum(coalesce(col("sum_o"), lit(0.0)) +
        coalesce(col("sum_f"), lit(0.0)) +
        coalesce(col("sum_p"), lit(0.0))).as("t")).head.getDouble(0)
    val direct = orders
      .agg(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"))
      .head.getDouble(0)
    assert(math.abs(cells - direct) < 1e-6)
  }

  test("profile reports nulls, exact NDV, and native-typed min/max rendering") {
    val df = Seq(
      (1L, Some(3.5), "b"), (2L, None, "a"), (3L, Some(10.25), "a")
    ).toDF("id", "v", "s")
    val out = Olap.profile(df, Seq(
      "id" -> Olap.AsLong, "v" -> Olap.AsDouble, "s" -> Olap.AsString))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("v").getAs[Long]("n_nulls") == 1L)
    assert(out("v").getAs[Long]("n_distinct") == 2L)
    // numeric max is 10.25 — a string-ordered max would have picked "3.5000"
    assert(out("v").getAs[String]("max_val") == "10.2500")
    assert(out("s").getAs[String]("min_val") == "a")
    assert(out("id").getAs[String]("max_val") == "3")
  }

  test("correlationMatrix computes exact Pearson coefficients per pair") {
    // y = 2x (r = 1), z = -x (r = -1), w uncorrelated-ish
    val df = Seq(
      (1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 1.0),
      (3.0, 6.0, -3.0, 9.0), (4.0, 8.0, -4.0, 2.0)
    ).toDF("x", "y", "z", "w")
    val out = Olap.correlationMatrix(df, Seq("x", "y", "z", "w"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(out.size == 6)
    assert(out(("x", "y")) == 1.0)
    assert(out(("x", "z")) == -1.0)
    assert(out(("y", "z")) == -1.0)
    val expectedXw = {
      val x = Seq(1.0, 2.0, 3.0, 4.0); val w = Seq(5.0, 1.0, 9.0, 2.0)
      val n = 4.0
      val r = (n * x.zip(w).map(p => p._1 * p._2).sum - x.sum * w.sum) /
        math.sqrt((n * x.map(v => v * v).sum - x.sum * x.sum) *
          (n * w.map(v => v * v).sum - w.sum * w.sum))
      math.rint(r * 1e6) / 1e6
    }
    assert(out(("x", "w")) == expectedXw)
  }

  test("correlationMatrix drops rows with a null in any listed column") {
    val df = Seq(
      (Some(1.0), Some(2.0)), (Some(2.0), Some(4.0)),
      (Some(3.0), Some(6.0)), (Some(9.0), None), (None, Some(7.0))
    ).toDF("x", "y")
    val out = Olap.correlationMatrix(df, Seq("x", "y")).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 1.0)
  }

  test("cubeSum emits all 2^n grouping sets from one Expand pass") {
    val df = Seq(("A", "x", 1.0), ("A", "y", 2.0), ("B", "x", 4.0))
      .toDF("f", "s", "v")
    val out = Olap.cubeSum(df, Seq("f", "s"), "v")
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set(
      (Some("A"), Some("x"), 0L, 1.0), (Some("A"), Some("y"), 0L, 2.0),
      (Some("B"), Some("x"), 0L, 4.0),
      (Some("A"), None, 1L, 3.0), (Some("B"), None, 1L, 4.0),
      (None, Some("x"), 2L, 5.0), (None, Some("y"), 2L, 2.0),
      (None, None, 3L, 7.0)))
    val plan = Olap.cubeSum(df, Seq("f", "s"), "v")
      .queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).size == 1, plan)
  }

  test("histogram bins by exact binary scaling and keeps partial aggregation") {
    val df = Seq(0.0, 1.0, 16383.999, 16384.0, 40000.0).toDF("v")
    val out = Olap.histogram(df, "v", width = 16384L)
      .orderBy("bin").collect()
    assert(out.map(r => (r.getAs[Long]("bin"), r.getAs[Long]("cnt"))).toSeq ==
      Seq((0L, 3L), (1L, 1L), (2L, 1L)))
    assert(out.head.getAs[Double]("bin_lo") == 0.0)
    // plan is scan → project → hash aggregate: no shuffle-by-row window
    val plan = Olap.histogram(df, "v", 16384L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("Window"))
  }

  test("categoricalEntropy: uniform gives ln k, monoculture gives 0") {
    val df = (Seq.fill(5)("en") ++ Seq.fill(5)("fr") ++ Seq.fill(5)("de"))
      .map(("balanced", _)) ++ Seq.fill(9)(("mono", "en"))
    val out = Olap.categoricalEntropy(df.toDF("source", "lang"),
      Seq("source"), "lang")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("balanced")._1 === 15L && out("balanced")._2 === 3L)
    assert(math.abs(out("balanced")._3 - math.log(3.0)) < 1e-6)
    assert(out("mono") === ((9L, 1L, 0.0)))
  }

  test("chiSquare: hand 2x2 case where a zero cell must contribute") {
    // obs: (a,p)=4, (a,q)=0, (b,p)=0, (b,q)=4 -> perfect association
    // E = 2 everywhere; chi2 = 4 * (2^2/2) = 8; dof = 1; V = sqrt(8/8) = 1
    val df = (Seq.fill(4)(("a", "p")) ++ Seq.fill(4)(("b", "q")))
      .toDF("x", "y")
    val out = Olap.chiSquare(df, "x", "y")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(out === ((8L, 4L, 1L, 8.0, 1.0)))
  }

  test("chiSquare: exactly balanced independence gives 0") {
    val df = (for { x <- 1 to 3; y <- 1 to 4; _ <- 1 to 2 }
      yield (s"x$x", s"y$y")).toDF("x", "y")
    val out = Olap.chiSquare(df, "x", "y")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(out === ((24L, 12L, 6L, 0.0, 0.0)))
  }

  test("chiSquare: null categories are levels, consistent with MI") {
    // y = null is its own level: the balanced grid over {a,b}×{p,null}
    // must read as perfect independence — before the null-safe grid
    // join, the null column's observed cells never matched, so the
    // whole null level's mass entered as spurious (0−E)²/E.
    val df = (Seq.fill(2)(("a", "p")) ++ Seq.fill(2)(("a", null)) ++
      Seq.fill(2)(("b", "p")) ++ Seq.fill(2)(("b", null))).toDF("x", "y")
    val out = Olap.chiSquare(df, "x", "y")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(out === ((8L, 4L, 1L, 0.0, 0.0)))
  }

  test("mutualInformation: independent columns give ~0 nats") {
    // perfectly balanced independent grid: p(xy) = p(x)p(y) exactly
    val df = (for { x <- 1 to 4; y <- 1 to 3; _ <- 1 to 5 }
      yield (s"x$x", s"y$y")).toDF("x", "y")
    val out = Olap.mutualInformation(df, "x", "y")
      .as[(Long, Long, Double)].head()
    assert(out._1 === 60L && out._2 === 12L)
    assert(out._3 === 0.0)
  }

  test("mutualInformation: Y a function of X gives H(X)") {
    // X uniform over 4 levels, Y = X -> I = H(X) = ln 4
    val df = (for { x <- 1 to 4; _ <- 1 to 10 }
      yield (s"x$x", s"y$x")).toDF("x", "y")
    val mi = Olap.mutualInformation(df, "x", "y")
      .select("mi_nats").as[Double].head()
    assert(math.abs(mi - math.log(4.0)) < 1e-5, s"mi=$mi")
  }

  test("mutualInformation counts null categories as levels") {
    val df = Seq(("a", Some("p")), ("a", None), ("b", Some("p")),
      ("b", None)).toDF("x", "y")
    val out = Olap.mutualInformation(df, "x", "y")
      .as[(Long, Long, Double)].head()
    assert(out._1 === 4L && out._2 === 4L) // null y is its own level
    assert(out._3 === 0.0) // and independent of x here
  }

  test("spearman is ±1 on any monotone relation, per group") {
    val df = Seq(
      ("up", 1.0, 1.0), ("up", 2.0, 4.0), ("up", 3.0, 9.0),
      ("up", 4.0, 16.0),
      ("dn", 1.0, 9.0), ("dn", 2.0, 4.0), ("dn", 3.0, 1.0))
      .toDF("g", "x", "y")
    val out = Olap.spearman(df, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out("up") == ((4L, 1.0)))   // x² is monotone — Pearson isn't 1
    assert(out("dn") == ((3L, -1.0)))
  }

  test("spearman midranks ties exactly (hand-computed)") {
    // x = [1,1,2,3], y = [10,20,20,30]: scipy-style midranks give
    // ρ = 3.75/4.5 = 0.8333… → floor-quantized 0.833333.
    val df = Seq(("g", 1.0, 10.0), ("g", 1.0, 20.0), ("g", 2.0, 20.0),
      ("g", 3.0, 30.0)).toDF("g", "x", "y")
    val rho = Olap.spearman(df, Seq("g"), "x", "y")
      .select("rho").as[Double].head()
    assert(rho == math.floor(3.75 / 4.5 * 1e6) / 1e6)
  }

  test("spearman: constant variable gives null, nulls are dropped") {
    val df = Seq(("g", 1.0, Some(5.0)), ("g", 2.0, Some(5.0)),
      ("g", 3.0, None)).toDF("g", "x", "y")
    assert(Olap.spearman(df, Seq("g"), "x", "y")
      .select("rho").as[Option[Double]].head().isEmpty)
  }
}
