package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("CovAgg moments match a driver-side computation exactly in structure") {
    val vecs = Seq(
      Array(1.0f, 2.0f), Array(3.0f, 4.0f), Array(5.0f, 0.0f))
    val df = vecs.map(Tuple1(_)).toDF("v")
    val s = df.agg(graft.functions.CovAgg.covState(col("v"), 2))
      .head().getSeq[Double](0).toArray
    assert(s(0) == 3.0)              // n
    assert(s(1) == 9.0 && s(2) == 6.0) // Σx, Σy
    // upper triangle: Σxx=1+9+25, Σxy=2+12+0, Σyy=4+16
    assert(s(3) == 35.0 && s(4) == 14.0 && s(5) == 20.0)
  }

  test("PCA on planted anisotropic 2D data recovers the dominant axis") {
    // full factorial grid: wide spread along the diagonal, tiny
    // orthogonal jitter, EXACTLY zero cross-covariance by symmetry
    val pts = for {
      m <- -10 to 10
      o <- -2 to 2
    } yield {
      val tMain = m * 1.0
      val tOff = o * 0.05
      Array(((tMain - tOff) / math.sqrt(2)).toFloat,
        ((tMain + tOff) / math.sqrt(2)).toFloat)
    }
    val df = pts.map(Tuple1(_)).toDF("v")
    val model = Embeddings.fitPca(df, "v", dim = 2, k = 2)
    // dominant axis ≈ ±(1,1)/√2
    val pc1 = model.components(0)
    assert(math.abs(math.abs(pc1(0)) - math.abs(pc1(1))) < 1e-6)
    assert(math.abs(math.abs(pc1(0)) - 1.0 / math.sqrt(2)) < 1e-6)
    // components orthonormal
    val dot = model.components(0).zip(model.components(1))
      .map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-9)
    assert(model.explainedVariance(1) > 0.99)
  }

  test("kmeans recovers well-separated planted clusters") {
    // three tight 2D blobs around (0,0), (10,0), (0,10)
    val blobs = for {
      (cx, cy) <- Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0))
      dx <- -1 to 1; dy <- -1 to 1
    } yield (cx, cy, Array((cx + dx * 0.1).toFloat, (cy + dy * 0.1).toFloat))
    val df = blobs.zipWithIndex
      .map { case ((_, _, v), i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val (centroids, assigned) =
      Embeddings.kmeans(df, "vec_id", "embedding", dim = 2, k = 3, iters = 5)
    // every planted center has a recovered centroid within 0.1
    Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0)).foreach { case (cx, cy) =>
      assert(centroids.exists(c =>
        math.abs(c(0) - cx) < 0.1 && math.abs(c(1) - cy) < 0.1),
        s"no centroid near ($cx,$cy): ${centroids.map(_.mkString("[", ",", "]")).mkString}")
    }
    // each blob lands in exactly one cluster (9 points per cluster)
    val sizes = assigned.groupBy("cluster").count()
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(sizes == Seq(9L, 9L, 9L))
  }

  test("kmeans assignments are invariant to input partitioning") {
    // the declared no-oracle reason is CROSS-ENGINE float wobble;
    // within Spark the decimal-exact centroid moments must make the
    // result partition-independent — pin that stronger property
    val pts = (0 until 120).map { i =>
      (i.toLong, Array(((i % 7) * 3.0).toFloat, ((i % 11) * 2.0).toFloat))
    }
    def run(parts: Int) = {
      val df = pts.toDF("vec_id", "embedding").repartition(parts)
      val (cs, assigned) = Embeddings.kmeans(
        df, "vec_id", "embedding", dim = 2, k = 4, iters = 3)
      (cs.map(_.toSeq).toSeq,
        assigned.select("vec_id", "cluster")
          .as[(Long, Int)].collect().toMap)
    }
    val (c1, a1) = run(1)
    val (c16, a16) = run(16)
    assert(c1 == c16 && a1 == a16)
  }

  test("kmeans centroid pass is one aggregate — no window, no join, no explode") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val init = emb.orderBy("vec_id").limit(4)
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val pass = emb
      .groupBy(Embeddings.nearestCentroid(col("embedding"), init).as("c"))
      .agg(graft.functions.VecSumAgg.vecSum(col("embedding"), 64))
    val plan = pass.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.toLowerCase.contains("join")
      && !plan.contains("Generate"), s"unexpected operators:\n$plan")
  }

  test("projection variance is ordered by eigenvalue and plan stays shuffle-free") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val model = Embeddings.fitPca(emb, "embedding", dim = 64, k = 3)
    assert(model.eigenvalues(0) >= model.eigenvalues(1))
    assert(model.eigenvalues(1) >= model.eigenvalues(2))
    val proj = Embeddings.project(emb, "embedding", model)
    val stats = proj.agg(
      var_samp(col("pc1")), var_samp(col("pc2")), var_samp(col("pc3")),
      abs(avg(col("pc1")))).head()
    // projection onto PC i has variance = eigenvalue i (centered data)
    assert(math.abs(stats.getDouble(0) - model.eigenvalues(0)) / model.eigenvalues(0) < 1e-6)
    assert(stats.getDouble(0) >= stats.getDouble(1))
    assert(stats.getDouble(1) >= stats.getDouble(2))
    assert(stats.getDouble(3) < 1e-9) // centered: mean projection 0
    // projection is a pure scan+project: no Exchange
    assert(!proj.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("IntMomentsAgg pass is one aggregate — no window, no join, " +
    "no explode — and merges exactly across partitionings") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pass = emb.agg(graft.functions.IntMomentsAgg
      .intMoments(col("embedding"), 64, 10000000L))
    val plan = pass.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.toLowerCase.contains("join")
      && !plan.contains("Generate"), s"unexpected operators:\n$plan")
    def state(df: org.apache.spark.sql.DataFrame) = df
      .agg(graft.functions.IntMomentsAgg
        .intMoments(col("embedding"), 64, 10000000L).as("s"))
      .head().getSeq[java.math.BigDecimal](0).map(_.toBigInteger).toSeq
    assert(state(emb) == state(emb.repartition(17)))
  }

  test("deterministic PCA agrees with the Jacobi fit on the real " +
    "corpus and is partition-invariant") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val det = Embeddings.fitPcaDeterministic(emb, "embedding", dim = 64, k = 3)
    val jac = Embeddings.fitPca(emb, "embedding", dim = 64, k = 3)
    // each quantized power-iteration axis is (anti)parallel to the
    // Jacobi eigenvector: |cos| > 0.999
    for (c <- 0 until 3) {
      val v = det.components(c).map(_.toDouble / 1e7)
      val w = jac.components(c)
      val dot = v.zip(w).map { case (a, b) => a * b }.sum
      val nv = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(dot) / nv > 0.999, s"component $c misaligned: $dot")
      // unit norm up to the 1e-7 quantization grid
      assert(math.abs(nv - 1.0) < 1e-5, s"component $c norm $nv")
    }
    // eigenvalues match at their 1e-6 quantization
    for (c <- 0 until 3)
      assert(math.abs(det.eigenvaluesQ(c) / 1e6 - jac.eigenvalues(c)) < 1e-3)
    // EXACT integer model invariance under repartitioning — the whole
    // point of the IntMomentsAgg discipline
    val det2 = Embeddings.fitPcaDeterministic(
      emb.repartition(13), "embedding", dim = 64, k = 3)
    assert(det2.components.flatten.toSeq == det.components.flatten.toSeq)
    assert(det2.muQ.toSeq == det.muQ.toSeq)
    assert(det2.eigenvaluesQ.toSeq == det.eigenvaluesQ.toSeq)
  }

  test("deterministic projection is shuffle-free integer codegen") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val det = Embeddings.fitPcaDeterministic(emb, "embedding", dim = 64, k = 3)
    val proj = Embeddings.projectDeterministic(emb, "embedding", det)
    assert(!proj.queryExecution.executedPlan.toString.contains("Exchange"))
    // deterministic twice over
    val a = proj.select("vec_id", "pc1", "pc2", "pc3").collect().toSeq
    val b = Embeddings.projectDeterministic(
      emb.repartition(7), "embedding", det)
      .select("vec_id", "pc1", "pc2", "pc3").collect().toSeq
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet)
  }

  test("dimHealth: exact sample variance at 1e6 scale; dead dims " +
    "report 0; partition-invariant") {
    import spark.implicits._
    // dim0: {0,1} -> sample var 0.5 -> 500000; dim1 constant (dead);
    // dim2: {-1,1} -> var 2 -> 2000000.
    val emb = Seq(
      (1L, Array(0.0, 7.0, -1.0)),
      (2L, Array(1.0, 7.0, 1.0)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.dimHealth(emb, "embedding", dim = 3)
      .select("dim", "var_q6", "qmin", "qmax")
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (0, 500000L, 0L, 10000000L),
      (1, 0L, 70000000L, 70000000L),
      (2, 2000000L, -10000000L, 10000000L)))
    val out5 = Embeddings.dimHealth(emb.repartition(5), "embedding", dim = 3)
      .select("dim", "var_q6", "qmin", "qmax")
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(out5 === out)
  }

  test("quantizeInt8: known codes, constant dims map to 0, " +
    "partition-invariant") {
    import spark.implicits._
    // dim0 spans [0,10], dim1 spans [10,30], dim2 is constant.
    val emb = Seq(
      (1L, Array(0.0, 10.0, 7.0)),
      (2L, Array(5.0, 20.0, 7.0)),
      (3L, Array(10.0, 30.0, 7.0)))
      .toDF("vec_id", "embedding")
    val out = Embeddings.quantizeInt8(emb, "vec_id", "embedding", dim = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // codes: v1 (0,0,0); v2 (floor(5*25.5)=127, floor(10*12.75)=127, 0);
    // v3 (255, 255, 0).
    assert(out === Map(
      1L -> ((0L, 0L, 0L)),
      2L -> ((254L, 0L, 127L)),
      3L -> ((510L, 0L, 255L))))
    val out7 = Embeddings.quantizeInt8(
      emb.repartition(5), "vec_id", "embedding", dim = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out7 === out)
  }
}
