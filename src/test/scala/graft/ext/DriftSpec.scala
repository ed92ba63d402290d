package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar mirror of [[Drift.psi]]'s pure-integer term contract:
    * term12 = (|A−B| · lnRatioFp(max,min)) div (M·10⁶) with exact
    * rational proportions (eps = 1/10⁶ on an absent side).
    */
  private def termMicro12(br: Long, nr: Long, bc: Long, nc: Long): Long = {
    val (pn, pd) = if (br == 0) (1L, 1000000L) else (br, nr)
    val (qn, qd) = if (bc == 0) (1L, 1000000L) else (bc, nc)
    val a = qn * pd
    val b = pn * qd
    val lnFp = graft.functions.DetMath.lnRatioFpBig(a max b, a min b)
    ((BigInt((a - b).abs) * lnFp) / (BigInt(pd * qd) * 1000000L)).toLong
  }

  test("psi is zero for identical distributions") {
    val a = (1L to 100L).map(i => (i % 10) * 10.0).toDF("v")
    val out = Drift.psi(a, a, "v", width = 16L)
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((0L, 6L, 100L, 100L)))
  }

  test("psi matches the scalar-mirror value on a two-bin shift") {
    // ref: 80/20 across bins 0/1; cur: 20/80
    val ref = (Seq.fill(80)(1.0) ++ Seq.fill(20)(20.0)).toDF("v")
    val cur = (Seq.fill(20)(1.0) ++ Seq.fill(80)(20.0)).toDF("v")
    val out = Drift.psi(ref, cur, "v", width = 16L)
      .as[(Long, Long, Long, Long)].head()
    val expected = termMicro12(80, 100, 20, 100) + termMicro12(20, 100, 80, 100)
    assert(out._1 == expected && out._2 == 2L)
    // and the integer sum is within a 12-dp quantum per term of the
    // IEEE-double PSI — accuracy check, not the equality contract
    val ieee = (0.2 - 0.8) * math.log(0.2 / 0.8) +
      (0.8 - 0.2) * math.log(0.8 / 0.2)
    assert(math.abs(out._1 - ieee * 1e12) <= 2.0)
  }

  test("psi survives a bin present on only one side via the eps floor") {
    val ref = Seq(1.0, 1.0, 1.0, 1.0).toDF("v")
    val cur = Seq(1.0, 1.0, 100.0, 100.0).toDF("v") // bin 6 unseen in ref
    val out = Drift.psi(ref, cur, "v", width = 16L)
      .as[(Long, Long, Long, Long)].head()
    assert(out._1 == termMicro12(4, 4, 2, 4) + termMicro12(0, 4, 2, 4))
    // reads as "shifted" on the rule-of-thumb scale (psi > 0.25)
    assert(out._1 > 250000000000L)
  }

  test("psi aggregates bins, never joining corpora row-to-row") {
    val a = (1L to 50L).map(_.toDouble).toDF("v")
    val plan = Drift.psi(a, a, "v", width = 16L)
      .queryExecution.executedPlan.toString
    // every shuffled join keys on the aggregated bin id — never a raw
    // corpus row (the bin-join subtree appears twice in the static
    // plan: once under the broadcast totals, once in the term pass;
    // AQE reuses the exchanges at runtime). The totals row itself
    // rides a broadcast, and nothing plans a cartesian product.
    val smj = "SortMergeJoin \\[\\w+".r.findAllIn(plan).toSeq
    assert(smj.nonEmpty && smj.forall(_.contains("[bin")), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("ksStatistic equals the brute-force D on random samples") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      a <- Gen.listOfN(80, Gen.chooseNum(0, 50))
      b <- Gen.listOfN(60, Gen.chooseNum(10, 60))
    } yield (a.map(_ / 2.0), b.map(_ / 2.0))
    (1 to 6).foreach { i =>
      val (a, b) = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val got = Drift.ksStatistic(a.toDF("v"), b.toDF("v"), "v")
        .select("ks_d").as[Double].head()
      val pooled = (a ++ b).distinct.sorted
      val want = pooled.map { x =>
        math.abs(a.count(_ <= x).toDouble / a.size -
          b.count(_ <= x).toDouble / b.size)
      }.max
      assert(math.abs(got - want) < 1e-6, s"seed $i: got $got want $want")
    }
  }

  test("jsDivergence: identical mixes give 0, disjoint give ln 2") {
    val a = Seq("x", "x", "y").toDF("c")
    assert(Drift.jsDivergence(a, a, "c")
      .select("jsd").as[Double].head() === 0.0)
    val b = Seq("z", "w").toDF("c")
    val jsd = Drift.jsDivergence(a, b, "c")
      .select("jsd").as[Double].head()
    assert(math.abs(jsd - math.log(2.0)) < 1e-6, s"jsd=$jsd")
  }

  test("jsDivergence stays defined when a category is absent on one side") {
    // PSI's failure mode: q has a category p lacks entirely
    val p = Seq("a", "a", "b").toDF("c")
    val q = Seq("a", "b", "NEW").toDF("c")
    val out = Drift.jsDivergence(p, q, "c")
      .as[(Long, Long, Long, Double)].head()
    assert(out._3 === 3L) // union of categories
    assert(out._4 > 0.0 && out._4 < math.log(2.0))
  }

  test("ksStatistic: identical samples give D = 0") {
    val a = Seq(1.0, 2.0, 3.0, 3.0, 7.5).toDF("v")
    val out = Drift.ksStatistic(a, a, "v")
      .as[(Long, Long, Double)].head()
    assert(out === ((5L, 5L, 0.0)))
  }

  test("ksStatistic: disjoint supports give D = 1") {
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(10.0, 11.0).toDF("v")
    val out = Drift.ksStatistic(a, b, "v")
      .as[(Long, Long, Double)].head()
    assert(out === ((3L, 2L, 1.0)))
  }

  test("ksStatistic hand case: D at the widest CDF gap") {
    // a = {1,2,3,4}, b = {3,4,5,6}: at v=2, F_a=0.5, F_b=0 -> D=0.5
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    val d = Drift.ksStatistic(a, b, "v")
      .select("ks_d").as[Double].head()
    assert(d === 0.5)
  }

  test("ksStatistic is partition-invariant and window-free") {
    val a = (1 to 500).map(_.toDouble * 3 % 97).toDF("v")
    val b = (1 to 400).map(_.toDouble * 7 % 89).toDF("v")
    val one = Drift.ksStatistic(a.repartition(1), b.repartition(1), "v")
      .select("ks_d").as[Double].head()
    val many = Drift.ksStatistic(a.repartition(13), b.repartition(7), "v")
      .select("ks_d").as[Double].head()
    assert(one === many)
    val plan = Drift.ksStatistic(a, b, "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"single-partition window:\n$plan")
  }

  test("mannWhitney matches the closed form on a tie-free separation") {
    // a = {1,2,3}, b = {4,5,6}: R_a = 6, U_a = 0, T = 0.
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(4.0, 5.0, 6.0).toDF("v")
    val out = Drift.mannWhitney(a, b, "v")
      .as[(Long, Long, Double, Option[Double])].head()
    val variance = 3.0 * 3.0 / 12.0 * ((6.0 + 1.0) - 0.0 / (6.0 * 5.0))
    val z = (0.0 - 3.0 * 3.0 / 2.0) / math.sqrt(variance)
    assert(out._1 == 3L && out._2 == 3L && out._3 == 0.0)
    assert(out._4.contains(math.floor(z * 1e6) / 1e6))
  }

  test("mannWhitney midranks ties and applies the tie correction") {
    // a = {1,1,2}, b = {1,2,2}: value 1 midrank 2 (×3), value 2
    // midrank 5 (×3) → R_a = 2·2+5 = 9, U_a = 3, T = 2·(27−3) = 48.
    val a = Seq(1.0, 1.0, 2.0).toDF("v")
    val b = Seq(1.0, 2.0, 2.0).toDF("v")
    val out = Drift.mannWhitney(a, b, "v")
      .as[(Long, Long, Double, Option[Double])].head()
    assert(out._3 == 3.0)
    val variance = 9.0 / 12.0 * (7.0 - 48.0 / 30.0)
    val z = (3.0 - 4.5) / math.sqrt(variance)
    assert(out._4.contains(math.floor(z * 1e6) / 1e6))
  }

  test("mannWhitney: U_a + U_b = n_a·n_b, identical samples give null z") {
    val a = (1 to 40).map(i => (i % 7).toDouble).toDF("v")
    val b = (1 to 25).map(i => (i % 5).toDouble).toDF("v")
    val uA = Drift.mannWhitney(a, b, "v").select("u_a").as[Double].head()
    val uB = Drift.mannWhitney(b, a, "v").select("u_a").as[Double].head()
    assert(uA + uB == 40.0 * 25.0)
    // All-equal pooled sample: tie-corrected variance is 0 → null z.
    val c = Seq(5.0, 5.0).toDF("v")
    val d = Seq(5.0, 5.0, 5.0).toDF("v")
    assert(Drift.mannWhitney(c, d, "v")
      .select("z").as[Option[Double]].head().isEmpty)
  }

  test("rocAuc: perfect separation 1, reversed 0, ties contribute half") {
    val lo = Seq(1.0, 2.0, 3.0).toDF("s")
    val hi = Seq(4.0, 5.0, 6.0).toDF("s")
    assert(Drift.rocAuc(hi, lo, "s").select("auc").as[Double].head() == 1.0)
    assert(Drift.rocAuc(lo, hi, "s").select("auc").as[Double].head() == 0.0)
    // identical samples: every pair is a tie → AUC exactly 0.5
    assert(Drift.rocAuc(lo, lo, "s").select("auc").as[Double].head() == 0.5)
  }

  test("rocAuc matches the explicit pair count on a mixed sample") {
    // pos = {3, 1}, neg = {2, 2}: pairs (3>2)×2 = 2 wins, (1<2)×2 = 0
    // → AUC = 2/4 = 0.5; with a tie: pos {2,3} neg {2,1}:
    // wins (2>1),(3>2),(3>1) = 3, tie (2,2) = 0.5 → 3.5/4
    val auc1 = Drift.rocAuc(
      Seq(3.0, 1.0).toDF("s"), Seq(2.0, 2.0).toDF("s"), "s")
      .select("auc").as[Double].head()
    assert(auc1 == 0.5)
    val auc2 = Drift.rocAuc(
      Seq(2.0, 3.0).toDF("s"), Seq(2.0, 1.0).toDF("s"), "s")
      .select("auc").as[Double].head()
    assert(auc2 == 3.5 / 4.0)
  }

  test("mannWhitney is partition-invariant and window-free") {
    val a = (1 to 300).map(i => (i * 3 % 97).toDouble).toDF("v")
    val b = (1 to 200).map(i => (i * 7 % 89).toDouble).toDF("v")
    val one = Drift.mannWhitney(a.repartition(1), b.repartition(1), "v")
      .select("z").as[Double].head()
    val many = Drift.mannWhitney(a.repartition(13), b.repartition(7), "v")
      .select("z").as[Double].head()
    assert(one === many)
    val plan = Drift.mannWhitney(a, b, "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"single-partition window:\n$plan")
  }

  test("psiTrend: each day's row equals the pair psi against the " +
    "same reference") {
    val ref = (0L until 200L).map(i => (i % 64).toDouble).toDF("value")
    val cur = (
      (0L until 150L).map(i => ("d1", (i % 64).toDouble)) ++     // same
      (0L until 150L).map(i => ("d2", (i % 32).toDouble + 32)))  // shifted
      .toDF("day", "value")
    val trend = Drift.psiTrend(ref, cur, "value", "day", width = 16L)
      .as[(String, Double, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    for (d <- Seq("d1", "d2")) {
      val pair = Drift.psi(ref, cur.filter($"day" === d).select("value"),
        "value", width = 16L)
        .as[(Long, Long, Long, Long)].head()
      // trend keeps the float read; pair emits micro-units — the
      // division is the same one the float read performs
      assert(trend(d)._2 === pair._1.toDouble / 1e12, s"$d psi")
      assert(trend(d)._3 === pair._2, s"$d n_bins")
      assert((trend(d)._4, trend(d)._5) === ((pair._3, pair._4)), d)
    }
    // near-identical distribution (150%64 vs 200%64 differ slightly)
    // ~ small drift; the shifted day is an order of magnitude above
    assert(math.abs(trend("d1")._2) < 0.05)
    assert(trend("d2")._2 > 0.5)
  }

  test("psiTrend enforces its bounded-grid contract at runtime") {
    val ref = (0L until 64L).map(_.toDouble).toDF("value")
    val cur = (0L until 64L).map(i => ("d1", i.toDouble)).toDF("day", "value")
    val e = intercept[IllegalArgumentException] {
      Drift.psiTrend(ref, cur, "value", "day", width = 16L,
        maxGridCells = 2)
    }
    assert(e.getMessage.contains("maxGridCells"))
    assert(e.getMessage.contains("Drift.psi"))
  }

  test("psiTermMicro12 scalar: eps branches, zero term, domain guard") {
    import graft.functions.DetMath
    // symmetric inputs → A == B → ln(1) = 0 → term 0 exactly
    assert(DetMath.psiTermMicro12(5L, 5L, 100L, 100L, 1000000L) === 0L)
    // pin the CONTRACT formula (rational eps floors + lnRatioFpBig +
    // truncating BigInt divide) independent of the impl's structure
    def model(br: Long, bc: Long, nr: Long, nc: Long, ed: Long): Long = {
      val (pn, pd) = if (br == 0) (1L, ed) else (br, nr)
      val (qn, qd) = if (bc == 0) (1L, ed) else (bc, nc)
      val a = qn * pd; val b = pn * qd
      ((BigInt((a - b).abs) * DetMath.lnRatioFpBig(a max b, a min b)) /
        (BigInt(pd) * BigInt(qd) * 1000000L)).toLong
    }
    val cases = Seq(
      (0L, 7L, 100L, 50L), (7L, 0L, 100L, 50L), (3L, 9L, 30L, 90L),
      (1L, 1L, 2L, 2L), (1000L, 1L, 5000L, 4000L))
    cases.foreach { case (br, bc, nr, nc) =>
      assert(DetMath.psiTermMicro12(br, bc, nr, nc, 1000000L) ===
        model(br, bc, nr, nc, 1000000L), s"($br,$bc,$nr,$nc)")
    }
    // domain guard: any leg past 2^30 must throw, never wrap
    val big = (1L << 30) + 1
    intercept[IllegalArgumentException](
      DetMath.psiTermMicro12(1L, 1L, big, 10L, 1000000L))
    intercept[IllegalArgumentException](
      DetMath.psiTermMicro12(1L, 1L, 10L, big, 1000000L))
    intercept[IllegalArgumentException](
      DetMath.psiTermMicro12(1L, 1L, 10L, 10L, big))
  }

  test("psiTrend rejects an eps too fine for exact Long term products") {
    // epsDen past 2^30 could wrap qn·pd back inside the ln kernel's
    // accepted domain — must fail loudly, never compute silently wrong
    val ref = (0L until 16L).map(_.toDouble).toDF("value")
    val cur = (0L until 16L).map(i => ("d1", i.toDouble)).toDF("day", "value")
    val e = intercept[IllegalArgumentException] {
      Drift.psiTrend(ref, cur, "value", "day", width = 4L, eps = 1e-12)
    }
    assert(e.getMessage.contains("eps too fine"))
  }
}
