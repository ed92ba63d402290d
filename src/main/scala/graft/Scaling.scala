package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve measurement for the heaviest inventory queries: build a
  * `factor`× corpus from the base SF dir and time each query on both,
  * printing measured wall-time ratios (SCALING.md records the results).
  *
  * Corpus construction keeps duplicate/near-dup CLUSTER SIZES constant
  * while cluster COUNT scales — the realistic growth mode for a
  * training corpus, and the one that doesn't quadratically inflate
  * candidate pairs by construction:
  *   - documents/customer text: each copy k Caesar-shifts letters by k
  *     (a bijective char map preserves every in-copy edit distance and
  *     shingle-overlap structure EXACTLY while making copies
  *     content-disjoint);
  *   - ids shift by k·10^12 (disjoint key spaces, graph becomes k
  *     disjoint isomorphic components); orders/part shift the SAME
  *     keys as lineitem so each copy is a referentially consistent
  *     sub-database;
  *   - embeddings get a per-copy orthogonal transform (coordinate
  *     rotation + sign flip: in-copy geometry exactly preserved,
  *     copy directions spread over the sphere).
  *
  * Known caveats, stated where they matter:
  *   - q_dedup_eval's left side is pinned to `doc_id < 200`, so only
  *     its right side and corpus scan scale.
  *   (q_semdedup's former fixed-k caveat is CLOSED as of round 14:
  *   k rides `Dedup.semDeDupK` — corpus-sized, E[cluster]≈256 — so
  *   its curves are measured results, not config artifacts.)
  *
  * Usage: SPARK_GRAFT_SF_DIR=<base> SPARK_GRAFT_SCALE_FACTOR=10
  *   sbt "runMain graft.Scaling"
  */
object Scaling {

  /** Measured set — overridable (comma-separated) via
    * SPARK_GRAFT_SCALE_KEYS for targeted higher-factor runs.
    */
  private def Keys: Seq[String] =
    sys.env.get("SPARK_GRAFT_SCALE_KEYS")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq(
        "q_dedup_edit", "q_pagerank", "q_semdedup", "q_record_link",
        "q_dedup_eval"))

  private def caesar(c: Column, k: Int): Column = {
    val lo = "abcdefghijklmnopqrstuvwxyz"
    val hi = lo.toUpperCase
    def rot(s: String): String = {
      val n = ((k % s.length) + s.length) % s.length
      s.drop(n) + s.take(n)
    }
    if (k == 0) c else translate(c, lo + hi, rot(lo) + rot(hi))
  }

  /** Copy k of the embeddings table — THE one v4 signed-permutation
    * transform (scaladoc above), shared by [[buildScaled]] and the
    * embeddings-only rung corpora (`graft.IvfProbe --factor`) so the
    * two can never drift onto different geometries (the v1/v3
    * constructions were both replaced for degenerate geometry; a
    * second copy of this code would re-open that door).
    */
  private[graft] def embeddingCopy(
      d: DataFrame, k: Int, off: Long = 1000000000000L): DataFrame = {
    val dim = 64
    val r = (7 * k) % dim
    val rot =
      if (r == 0) col("embedding")
      else concat(
        slice(col("embedding"), r + 1, dim - r),
        slice(col("embedding"), 1, r))
    val sigBits = (k / 64) * 31 + k
    val signs = Array.tabulate(dim)(j =>
      if (((sigBits >> (j % 20)) & 1) == 1) -1.0f else 1.0f)
    val spun =
      if (signs.forall(_ == 1.0f)) rot
      else zip_with(rot, array(signs.map(lit): _*), (e, sg) => e * sg)
    d.select(
      (col("vec_id") + lit(k * off)).as("vec_id"),
      spun.as("embedding"), col("label"))
  }

  /** Copy k of the documents table — the v4 Caesar construction
    * (bijective char map: in-copy edit distances and shingle overlap
    * preserved exactly, copies content-disjoint on letters), shared by
    * [[buildScaled]] and the documents-only rung corpora
    * (`graft.SimHashShardProbe --factor`) for the same
    * no-construction-drift reason as [[embeddingCopy]].
    */
  private[graft] def documentCopy(
      d: DataFrame, k: Int, off: Long = 1000000000000L): DataFrame =
    d.select(
      (col("doc_id") + lit(k * off)).as("doc_id"),
      caesar(col("text"), k).as("text"),
      col("lang"), col("source"), col("n_chars"))

  /** Generator version marker shared by every scaled-corpus builder —
    * bump on ANY change to the construction.
    */
  private[graft] val generatorVersion = "v4-signed-permutation"

  private def buildScaled(
      spark: SparkSession, base: String, out: String, factor: Int): Unit = {
    val off = 1000000000000L // disjoint id spaces per copy
    def copies(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(k => f(df, k)).reduce(_ union _)

    val docs = spark.read.parquet(s"$base/documents.parquet")
    copies(docs, documentCopy(_, _, off))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings: per-copy ORTHOGONAL transform — a signed
    // permutation: rotate coordinates by 7k (mod dim) and flip the
    // sign of coordinate j iff bit (j mod 20) of (k div 64)·31 + k is
    // set. A diagonal ±1 matrix composed with a permutation is
    // orthogonal, so every in-copy dot product and norm is exactly
    // preserved while copy DIRECTIONS spread over the sphere — and
    // the (rotation, sign-pattern) pair is distinct for every k up to
    // 2^20, so no two copies share a transform at any realistic
    // factor. (v3 used rotation + whole-vector parity flip, period
    // 64: at factor 100, copies k and k+64 were byte-identical —
    // constructed exact duplicates. The earlier v1 `+ k·0.5`
    // translation was worse: every copy nearly collinear with the
    // all-ones vector, collapsing every angular method into a handful
    // of LSH buckets.)
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    copies(emb, embeddingCopy(_, _, off))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val cust = spark.read.parquet(s"$base/customer.parquet")
    copies(cust, (d, k) => d.select(
      (col("c_custkey") + lit(k * off)).as("c_custkey"),
      caesar(col("c_name"), k).as("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")))
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    val li = spark.read.parquet(s"$base/lineitem.parquet")
    copies(li, (d, k) => d.withColumn(
      "l_orderkey", col("l_orderkey") + lit(k * off))
      .withColumn("l_partkey", col("l_partkey") + lit(k * off)))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // orders/part scale WITH lineitem, shifting the same keys by the
    // same per-copy offset (plus o_custkey, matching customer), so
    // every copy is a referentially CONSISTENT sub-database — a
    // verbatim copy would leave 1−1/factor of fact rows with dangling
    // FKs and turn every fact-dim join into a mostly-no-match
    // workload that measures nothing real.
    val ord = spark.read.parquet(s"$base/orders.parquet")
    copies(ord, (d, k) => d
      .withColumn("o_orderkey", col("o_orderkey") + lit(k * off))
      .withColumn("o_custkey", col("o_custkey") + lit(k * off)))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    val part = spark.read.parquet(s"$base/part.parquet")
    copies(part, (d, k) => d
      .withColumn("p_partkey", col("p_partkey") + lit(k * off)))
      .write.mode("overwrite").parquet(s"$out/part.parquet")

    // True dims ride along verbatim: nothing shifts their keys
    // (customer keeps c_nationkey, lineitem keeps l_suppkey), so
    // their joins stay valid — the realistic growth mode (a 30x
    // corpus does not grow 30x more nations).
    for (t <- Seq("region", "nation", "supplier")) {
      val src = java.nio.file.Paths.get(s"$base/$t.parquet")
      if (java.nio.file.Files.exists(src)) {
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(out))
        java.nio.file.Files.copy(src,
          java.nio.file.Paths.get(s"$out/$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

    // events: disjoint user/event id spaces per copy, timestamps
    // UNCHANGED — the realistic growth mode for an event stream is
    // more concurrent users over the same wall-clock span, which
    // keeps time-window/day-bucket counts growing linearly while
    // per-user session structure stays constant.
    val ev = spark.read.parquet(s"$base/events.parquet")
    copies(ev, (d, k) => d
      .withColumn("event_id", col("event_id") + lit(k * off))
      .withColumn("user_id", col("user_id") + lit(k * off)))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      s"/tmp/graft_scale_${factor}x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // At scale factors >= 30 the default cpus-sized shuffle can leave a
    // single skewed reducer grinding; allow overriding independently to
    // probe partition-granularity effects.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.prepare(spark)

    // The marker records the GENERATOR VERSION, not just existence: a
    // corpus built by an older construction (e.g. the degenerate
    // embedding translation replaced in v2) must rebuild, or every
    // curve silently measures the stale geometry. Bump Scaling.
    // generatorVersion on any change to buildScaled's content.
    val marker = new java.io.File(s"$out/_built_$factor")
    val upToDate = marker.exists() &&
      java.nio.file.Files.readString(marker.toPath) == generatorVersion
    if (!upToDate) {
      System.err.println(
        s"[scaling] building ${factor}x corpus ($generatorVersion) at $out")
      buildScaled(spark, base, out, factor)
      marker.getParentFile.mkdirs()
      java.nio.file.Files.writeString(marker.toPath, generatorVersion)
      // The corpus under `out` just changed: drop any corpus-size
      // memo a previous query against that dir may have pinned
      // (SparkEntry.corpusCountCache's immutability contract).
      SparkEntry.clearCorpusSizeCache()
    }

    // Warm codegen/JIT on the tiny SF so first-run compilation cost
    // doesn't land in the base timings.
    Keys.foreach { k =>
      try SparkEntry.queries(k)(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").format("noop").save()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    spark.catalog.clearCache()

    // Stream each timing to an append-only JSONL the moment it lands:
    // a 150-key sweep can outlive its parent session, and a harness
    // that only prints at exit loses everything when the process is
    // killed (that is exactly what happened to the first round-13 run).
    val progressLog = sys.env.get("SPARK_GRAFT_SCALE_LOG")
    def record(phase: String, k: String, sec: Double): Unit = {
      val line = s"""{"key":"$k","phase":"$phase","sec":${f"$sec%.3f"}}"""
      System.err.println(s"[scaling] $line")
      progressLog.foreach { p =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(p), line + "\n",
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      }
    }

    def time(phase: String, dir: String): Map[String, Double] =
      Keys.map { k =>
        val t0 = System.nanoTime()
        SparkEntry.queries(k)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        val sec = (System.nanoTime() - t0) / 1e9
        record(phase, k, sec)
        k -> sec
      }.toMap

    val baseT = time("base", base)
    val scaledT0 = time("scaled", out)
    // Contention defense (same idea as Bench's 2.5× re-time): a long
    // multi-query sweep in one JVM accumulates GC/JIT pressure that
    // can inflate a later query's scaled time several-fold (observed:
    // q_changepoint 19.8 s in a 12-query sweep vs 0.98 s solo). Any
    // query whose ratio exceeds half the data factor gets ONE solo
    // re-time; keep the minimum.
    val suspicious = Keys.filter(k =>
      scaledT0(k) / math.max(baseT(k), 1e-9) > factor / 2.0)
    val scaledT =
      if (suspicious.isEmpty) scaledT0
      else {
        System.err.println(
          s"[scaling] re-timing ${suspicious.size} contention suspect(s): " +
            suspicious.mkString(", "))
        val again = suspicious.map { k =>
          val t0 = System.nanoTime()
          SparkEntry.queries(k)(spark, out)
            .write.mode("overwrite").format("noop").save()
          spark.catalog.clearCache()
          val sec = (System.nanoTime() - t0) / 1e9
          record("retime", k, sec)
          k -> sec
        }.toMap
        scaledT0.map { case (k, v) =>
          k -> math.min(v, again.getOrElse(k, v))
        }
      }
    println(f"| query | ${1}x sec | ${factor}x sec | ratio |")
    println("|---|---|---|---|")
    Keys.foreach { k =>
      println(f"| $k | ${baseT(k)}%.2f | ${scaledT(k)}%.2f | " +
        f"${scaledT(k) / baseT(k)}%.2fx |")
    }
    val json = Keys.map(k =>
      s""""$k":{"base":${f"${baseT(k)}%.3f"},""" +
        s""""scaled":${f"${scaledT(k)}%.3f"},""" +
        s""""ratio":${f"${scaledT(k) / baseT(k)}%.3f"}}""")
      .mkString("{", ",", "}")
    println(s"""{"metric":"scaling","factor":$factor,"queries":$json}""")
    spark.stop()
  }
}
