package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** [EXT] Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). North-star extension; no reference equivalent.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k, query-side broadcast.
  *     O(|Q|·|C|) — the correctness baseline, fine when |Q| is small.
  *   - [[lshBucketedTopK]]: random-hyperplane (sign) LSH. Both sides
  *     hash to sign-bit buckets; the join keys on bucket id, so the
  *     candidate set per query is |C| / 2^bits on average and the whole
  *     thing is one shuffle-join on a short key — the 100 TB path.
  *
  * All arithmetic is done in double after widening the float vectors:
  * sequential left-to-right accumulation via `aggregate`, matching the
  * DuckDB oracle's `list_inner_product` evaluation order so rounded
  * results hash-match.
  */
object Similarity {

  /** Widen array<float> → array<double>. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential dot product — the codegen'd [[graft.functions.DotProduct]]
    * expression (the higher-order-function formulation
    * `aggregate(zip_with(a,b,_*_),0.0,_+_)` is interpreted per element:
    * measured ~50x slower on the pair scans below).
    */
  def dot(a: Column, b: Column): Column = VectorExprs.dot(a, b)

  /** Cosine similarity = dot / (||a|| * ||b||), computed exactly like
    * the DuckDB oracle formula so cross-engine rounding agrees.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Per-label centroid in LONG format: one row per (label, dimension)
    * with the mean component value — class prototypes for
    * nearest-centroid classification, cluster drift monitoring, or IVF
    * coarse-quantizer seeding.
    *
    * Long format is deliberate: explode + hash-aggregate keyed on
    * (label, dim) is map-side combinable and shuffles `labels × dim`
    * aggregate rows — never vectors — so it scales to any corpus. (A
    * collected array-of-avgs would need either HOF lambdas or a
    * per-label collect.) Reassemble with
    * `groupBy(label).agg(array_sort(collect_list(struct(dim, centroid))))`
    * when a vector shape is needed — labels × dim stays tiny.
    */
  def labelCentroids(
      emb: DataFrame, labelCol: String, vecCol: String): DataFrame =
    emb
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("__p", "__v")))
      .groupBy(col(labelCol), (col("__p") + 1).cast("int").as("dim"))
      // Decimal-exact sum, one double division: avg(double) sums in
      // partition order and can flip the 6dp rounding vs the oracle's
      // sequential sum. float→double is exact and both engines convert
      // the SAME double to the same DECIMAL(28,12), so the sum is
      // bit-identical cross-engine.
      .agg(round(
        sum(col("__v").cast("double").cast("decimal(28,12)")).cast("double") /
          count(lit(1)), 6).as("centroid"),
        count(lit(1)).as("n_vectors"))

  /** Runtime enforcement of a documented bounded-broadcast contract:
    * the operators below broadcast their query side, which is safe
    * ONLY while it stays small — and "the caller promised" does not
    * survive a 100× scale-up. The probe is `limit(max+1).count()`,
    * which short-circuits after max+1 rows (one cheap job, never a
    * full scan of a huge side), so an oversized side fails LOUDLY at
    * the contract boundary instead of OOMing executors mid-broadcast.
    */
  private def requireBoundedSide(
      df: DataFrame, max: Int, what: String, alternative: String): Unit = {
    val n = df.limit(max + 1).count()
    require(n <= max,
      s"$what exceeds the bounded-broadcast contract (> $max rows); " +
        s"route the unbounded side through $alternative instead")
  }

  /** Exact top-k neighbors for each query vector.
    *
    * @param candidates (idCol, vecCol) — the full corpus
    * @param queries    (idCol, vecCol) — the (small) query set; gets
    *                    broadcast so the corpus is never shuffled.
    *                    BOUNDED-SIDE CONTRACT, runtime-enforced: at
    *                    most `maxQueries` rows, else this throws — use
    *                    [[lshBucketedTopK]] / [[ivfTopK]] for an
    *                    unbounded query set.
    * @param k          neighbors per query
    * Similarities are rounded to 6 dp BEFORE ranking, with the id as a
    * tiebreaker — ranks stay deterministic across engines/partitionings.
    *
    * ID-NAMESPACE CONTRACT (all retrievers here): queries and
    * candidates must share one id namespace — the self-pair exclusion
    * compares ids, so two INDEPENDENT auto-increment id spaces would
    * silently drop candidate i from query i's neighbors on a mere
    * collision. Re-key one side if the sets come from different
    * tables. Zero-norm vectors are excluded on both sides (cosine is
    * undefined; their NaN sims would rank above every real neighbor).
    */
  def bruteForceTopK(
      candidates: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      maxQueries: Int = 1 << 16): DataFrame = {
    requireBoundedSide(queries, maxQueries,
      "bruteForceTopK query side", "lshBucketedTopK/ivfTopK")
    // Norms are computed once per ROW (not per pair); the pair loop is
    // one codegen'd dot product. Arithmetic stays identical to the
    // oracle formula dot/(sqrt(qq)*sqrt(cc)).
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", sqrt(dot(col("__qv"), col("__qv"))))
      // zero-norm vectors have no cosine direction: 0/0 = NaN and
      // Spark ranks NaN ABOVE every real sim, so an all-zero embedding
      // would poison rank 1 of every query — exclude them.
      .filter(col("__qn") > 0)
    val c = candidates.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", sqrt(dot(col("__cv"), col("__cv"))))
      .filter(col("__cn") > 0)
    val pairs = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    pairs
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  /** Recall@k of an approximate retriever against exact ground truth
    * — the eval every ANN deployment runs before trusting its index
    * ("measure, don't guess" applied to the library's own LSH/IVF
    * paths). Inputs are two top-k tables in the retriever schema
    * (query_id, neighbor_id, ...); output is per-query n_hits +
    * recall (exact integer-over-constant division). One equi-join on
    * (query, neighbor) + one query-keyed aggregate — scales with the
    * top-k tables, not the corpus.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val e = exact.select(col("query_id"), col("neighbor_id"))
    val a = approx.select(
      col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
    e.join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .withColumn("recall", col("n_hits").cast("double") / lit(k.toDouble))
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the `k` most-cosine-similar vectors with a DIFFERENT
    * label — the negatives that actually teach a bi-encoder, vs the
    * trivially-easy random ones. Same bounded-query-side contract and
    * 6-dp-cosine discipline as [[bruteForceTopK]]; the label
    * inequality prunes pairs before the rank, and the top-k is a
    * WindowGroupLimit (map-side k-prune), never a global sort. For
    * unbounded query sides, bucket with [[lshBucket]] first — the
    * [[graft.ext.Dedup.embeddingNearDuplicatesLsh]] path. The
    * bounded-side contract is runtime-enforced like
    * [[bruteForceTopK]]'s: > `maxQueries` query rows throws.
    */
  def hardNegatives(
      emb: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int, queryMax: Long, maxQueries: Int = 1 << 16): DataFrame = {
    val bounded = emb.filter(col(idCol) < queryMax)
    requireBoundedSide(bounded, maxQueries,
      "hardNegatives query side", "lshBucket-prefiltered candidates")
    val q = bounded.select(
      col(idCol).as("query_id"), col(labelCol).as("__ql"),
      col(vecCol).as("__qv"))
      .withColumn("__qn", sqrt(dot(col("__qv"), col("__qv"))))
      // zero-norm vectors have no cosine direction: 0/0 = NaN and
      // Spark ranks NaN ABOVE every real sim, so an all-zero embedding
      // would poison rank 1 of every query — exclude them.
      .filter(col("__qn") > 0)
    val c = emb.select(
      col(idCol).as("neighbor_id"), col(labelCol).as("neg_label"),
      col(vecCol).as("__cv"))
      .withColumn("__cn", sqrt(dot(col("__cv"), col("__cv"))))
      .filter(col("__cn") > 0)
    val pairs = c.crossJoin(broadcast(q))
      .filter(col("neg_label") =!= col("__ql"))
      .withColumn("sim",
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    pairs
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "neg_label", "sim", "rnk")
  }

  /** Deterministic pseudo-random unit-free hyperplanes for sign-LSH:
    * component j of plane p from a seeded generator so plans are
    * identical across runs/JVMs — and inlinable into the DuckDB oracle
    * (the same constants render into SQL literals).
    */
  private[graft] def hyperplane(p: Int, dim: Int): Array[Double] = {
    val rnd = new scala.util.Random(0x5EED0000L + p)
    Array.fill(dim)(rnd.nextGaussian())
  }

  /** Bucket-count ladder for corpus-sized sign-LSH: the smallest even
    * `bits` ≥ 4 keeping the EXPECTED bucket population ≤ 256, capped
    * at 30. A constant `bits` makes every self-join over LSH buckets
    * quadratic — bucket population grows with the corpus, so
    * Σ n_b² grows as n²/2^bits (measured: q_ann_hubness at bits=4 ran
    * 1.1 s on 2 k vectors and >20 min on 60 k). Scaling bits with
    * log₂(n) pins the population, making total pair work ~n·256 —
    * linear. The ladder is integer-threshold (n vs 256·2^b), stepped
    * by 2, so the DuckDB oracle reproduces the choice exactly with a
    * CASE over COUNT(*) — no float log at a rung boundary can
    * disagree between engines.
    *
    * Because the bucket id weights plane p by 2^p, the b-bit bucket is
    * the (b+Δ)-bit bucket mod 2^b — the oracle computes one max-width
    * bucket and masks, while Spark evaluates only the chosen planes.
    */
  def adaptiveLshBits(n: Long): Int = {
    var b = 4
    while (b < 30 && n > (256L << b)) b += 2
    b
  }

  /** Sign-LSH bucket id: one bit per hyperplane. The projection is
    * rounded to 6 dp before the sign test so bucket assignment can't
    * flip on a last-ulp difference between engines.
    */
  def lshBucket(vec: Column, dim: Int, bits: Int): Column = {
    val planes = (0 until bits).map(p => hyperplane(p, dim))
    planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      when(round(dot(vec, planeCol), 6) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN top-k: candidates are restricted to the query's sign-LSH
    * bucket, so the pair space shrinks ~2^bits-fold and the join is a
    * plain equi-join on (bucket) that AQE can re-plan for skew. Recall
    * is traded for scale; raise `k`/lower `bits` to recover.
    */
  def lshBucketedTopK(
      candidates: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      dim: Int, bits: Int = 8): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv"),
      lshBucket(col(vecCol), dim, bits).as("__bucket"))
      .withColumn("__qn", sqrt(dot(col("__qv"), col("__qv"))))
      // zero-norm vectors have no cosine direction: 0/0 = NaN and
      // Spark ranks NaN ABOVE every real sim, so an all-zero embedding
      // would poison rank 1 of every query — exclude them.
      .filter(col("__qn") > 0)
    val c = candidates.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      lshBucket(col(vecCol), dim, bits).as("__bucket"))
      .withColumn("__cn", sqrt(dot(col("__cv"), col("__cv"))))
      .filter(col("__cn") > 0)
    val pairs = c.join(q, Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    pairs
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  /** IVF-Flat ANN top-k.
    *
    * Coarse quantizer: `nlist` deterministic centroids (the corpus
    * vectors with the smallest ids — reproducible without a training
    * job; swap in k-means centroids for better recall). Every corpus
    * vector is assigned to its nearest centroid (one pass, `nlist`
    * static codegen'd dot products per row); each query probes its
    * `nprobe` nearest lists. Candidates come from an equi-join on the
    * list id, so the pair space is ~|C|·nprobe/nlist and the whole
    * search is one shuffle-join — the standard IVF trade of recall for
    * scale, complementary to [[lshBucketedTopK]] (IVF adapts to the
    * data distribution; sign-LSH doesn't).
    *
    * `nlist` at scale: like any bucket count, a PINNED nlist makes
    * per-list population — and with it the candidate join — grow
    * linearly with the corpus (pair work ~n²·nprobe/nlist). The
    * default 16 is sized for the test corpus (this method is the
    * frozen-oracle inventory shape); production callers use
    * [[ivfTopKSpread]] with [[adaptiveNlist]] — corpus-derived rung,
    * md5-rank seeding instead of the first-by-id seeds kept here.
    */
  def ivfTopK(
      candidates: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    require(nlist >= 1 && nprobe >= 1,
      s"nlist/nprobe must be >= 1: nlist=$nlist nprobe=$nprobe")
    ivfSearch(candidates, queries, idCol, vecCol, k, nprobe,
      ivfSeedsById(candidates, idCol, vecCol, nlist))
  }

  /** The frozen-oracle seed rule of [[ivfTopK]]: first `nlist` corpus
    * vectors by id. Package-private so diagnostics measure the exact
    * seed set the search uses.
    */
  private[graft] def ivfSeedsById(
      candidates: DataFrame, idCol: String, vecCol: String,
      nlist: Int): Array[(Int, Array[Double])] =
    seedVectors(candidates.orderBy(col(idCol).asc).limit(nlist)
      .select(col(vecCol)), "ivfTopK")

  /** List-count ladder for corpus-sized IVF: `nlist` =
    * min(n, max(16, ⌈n/4096⌉)) pins E[list size] ≈ 4096, so the
    * candidate equi-join stays ~n·4096·nprobe/nlist ≈ linear however
    * large the corpus — the [[adaptiveLshBits]] / `Dedup.semDeDupK`
    * discipline applied to IVF lists (a PINNED nlist makes pair work
    * n²·nprobe/nlist, quadratic). Pure integer arithmetic so a SQL
    * oracle derives the identical rung from COUNT(*):
    * `LEAST(n, GREATEST(16, (n + 4095) // 4096))`. 4096 (not LSH's
    * 256) because IVF probes `nprobe` lists per query instead of one
    * bucket, and the per-row assignment cost is nlist dot products —
    * a larger target population keeps the quantizer pass cheap while
    * the probed candidate set stays nprobe·4096.
    */
  def adaptiveNlist(n: Long): Int = {
    require(n >= 1, s"adaptiveNlist needs a non-empty corpus, got $n")
    // Clamped at Int.MaxValue: past n ≈ 8.8e12 the rung itself exceeds
    // Int (a bare .toInt would wrap NEGATIVE and fail ivfTopKSpread's
    // require with a misleading message — or worse, truncate to a
    // small positive rung and silently re-create the quadratic). Ceil
    // via n/4096 + remainder test, NOT (n + 4095)/4096: the addition
    // itself overflows near Long.MaxValue and the wrapped NEGATIVE
    // quotient would fall through max(16,·) to a silent rung of 16.
    val ceil = n / 4096L + (if (n % 4096L == 0L) 0L else 1L)
    math.min(math.min(n, math.max(16L, ceil)), Int.MaxValue.toLong).toInt
  }

  /** [[ivfTopK]] with PRODUCTION seeding: list centroids are the
    * `nlist` corpus vectors with the smallest portable 60-bit md5
    * prefix of their id (ties by id), cid = position in that rank
    * order — the `Embeddings.kmeansSpread` Forgy discipline.
    * First-`nlist`-by-id (what [[ivfTopK]] keeps for its frozen
    * oracle) is the documented trap (`Embeddings.scala` kmeans doc):
    * adjacent ids routinely share a source/shard/cluster, so the
    * whole quantizer lands inside one blob — every far-from-the-blob
    * vector piles into that blob's edge lists (hot lists → the
    * quadratic join this family exists to avoid) and cross-blob
    * recall collapses. md5-rank is a uniform draw over the corpus, id
    * order can't bias it, and one TakeOrdered pass finds the seeds —
    * O(n) at any nlist. Callers size `nlist` with [[adaptiveNlist]]
    * (corpus count in, rung out); both the rank order and the rung
    * are SQL-reproducible, so the DuckDB oracle proves this path at
    * any corpus size (`graft.IvfProbe` is the harness).
    */
  def ivfTopKSpread(
      candidates: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int, nprobe: Int = 4): DataFrame = {
    require(nlist >= 1 && nprobe >= 1,
      s"nlist/nprobe must be >= 1: nlist=$nlist nprobe=$nprobe")
    ivfSearch(candidates, queries, idCol, vecCol, k, nprobe,
      ivfSeedsSpread(candidates, idCol, vecCol, nlist))
  }

  /** [[ivfTopKSpread]]'s seed rule: the `nlist` smallest portable md5
    * ranks (ties by id), cid = rank position. Package-private for the
    * same diagnostic reason as [[ivfSeedsById]].
    */
  private[graft] def ivfSeedsSpread(
      candidates: DataFrame, idCol: String, vecCol: String,
      nlist: Int): Array[(Int, Array[Double])] =
    seedVectors(candidates.orderBy(
        graft.functions.HashExprs
          .md5Prefix60(col(idCol).cast("string")).asc,
        col(idCol).asc)
      .limit(nlist).select(col(vecCol)), "ivfTopKSpread")

  /** Deterministic centroid table for the IVF coarse quantizer,
    * collected once (`nlist` rows, the ONE bounded driver collect of
    * this module) and inlined as literals so assignment stays pure
    * projection. `ordered` must already be ordered and limited; cid =
    * row position in that order. Zero-norm seeds are dropped AFTER
    * indexing (cids keep their positions, gaps allowed) — such a
    * centroid would make every row's sim to it NaN and the struct
    * argmax would always pick it.
    */
  private def seedVectors(
      ordered: DataFrame, what: String): Array[(Int, Array[Double])] = {
    val centroids = ordered.collect()
      .zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Float](0).map(_.toDouble).toArray
      }
      .filter { case (_, c) => c.exists(_ != 0.0) }
    require(centroids.nonEmpty,
      s"$what: no nonzero centroid seeds in the candidate set")
    centroids
  }

  // array of (similarity, centroidId) structs; argmax = last of the
  // sorted array (struct ordering compares sim first, id breaks ties).
  // Row norm comes in as a column so dot(vec,vec) is evaluated once
  // per row, not once per centroid. No HOF lambdas anywhere: static
  // element_at extractions instead (lambda codegen is expensive).
  // Sims are rounded to 6 dp BEFORE the argmax so list assignment is
  // deterministic across engines (same guard as lshBucket).
  private def simsTo(
      centroids: Array[(Int, Array[Double])],
      vec: Column, vecNorm: Column): Column =
    array(centroids.map { case (cid, c) =>
      val cCol = array(c.map(lit): _*)
      val norm = math.sqrt(c.map(x => x * x).sum)
      struct(round(dot(vec, cCol) / (lit(norm) * vecNorm), 6).as("sim"),
        lit(cid).as("cid"))
    }: _*)

  /** Past this centroid count the quantizer switches from the
    * composable struct-sort tree (which grows ~10 expression nodes
    * per centroid and falls out of whole-stage codegen past a few
    * dozen — the [[graft.functions.NearestCentroidQ]] lesson) to the
    * codegen'd [[graft.functions.TopCentroidsBySim]] kernel. Both
    * produce bit-identical list ids (spec-pinned per row; the kernel
    * rung oracle-proven by `graft.IvfProbe` at nlist=147). 64 keeps
    * every frozen-inventory plan (nlist=16) and the proven 49-rung
    * plan byte-for-byte on the tree path.
    */
  private[graft] val quantizerKernelThreshold = 64

  /** Nearest-list id for one vector — tree or kernel by `useKernel`
    * (exposed so the parity spec can force both paths on one corpus).
    */
  private[graft] def nearestListCol(
      centroids: Array[(Int, Array[Double])],
      vec: Column, vecNorm: Column, useKernel: Boolean): Column =
    if (useKernel)
      VectorExprs.topCentroidsBySim(vec, centroids, 1).getItem(0)
    else
      element_at(array_sort(simsTo(centroids, vec, vecNorm)), -1)
        .getField("cid")

  /** The `n` probe-list ids for one query vector, (sim DESC, cid
    * DESC) — tree or kernel by `useKernel`.
    */
  private[graft] def probeListsCol(
      centroids: Array[(Int, Array[Double])],
      vec: Column, vecNorm: Column, n: Int, useKernel: Boolean): Column =
    if (useKernel)
      VectorExprs.topCentroidsBySim(vec, centroids, n)
    else {
      val ranked = reverse(array_sort(simsTo(centroids, vec, vecNorm)))
      array((1 to n).map(i => element_at(ranked, i).getField("cid")): _*)
    }

  /** The coarse-quantizer assignment frame: every nonzero-norm
    * candidate with its vector, norm, and nearest-centroid list id —
    * the first half of [[ivfTopK]]/[[ivfTopKSpread]], exposed
    * package-private so diagnostics (`graft.IvfProbe`'s list-balance
    * report) measure the EXACT assignment the search joins on rather
    * than re-deriving it.
    */
  private[graft] def ivfAssign(
      candidates: DataFrame, idCol: String, vecCol: String,
      centroids: Array[(Int, Array[Double])]): DataFrame =
    candidates.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", sqrt(dot(col("__cv"), col("__cv"))))
      .filter(col("__cn") > 0)
      // coalesce(…, -1): the assignment feeds an equi-join key, and a
      // NULLABLE key makes the join infer `isnotnull(<assignment>)` —
      // which the optimizer pushes into the Filter BELOW the Project,
      // so the whole quantizer expression (nlist dot products!) ran
      // TWICE per candidate row (measured r18: the Filter+Project pair
      // both carried the kernel at every rung, ~2× the assignment
      // cost). The sentinel makes the column non-nullable, the
      // inferred isnotnull folds to true, and the kernel evaluates
      // once; -1 is no centroid id, so a (theoretical) null
      // assignment still matches no probe list — row semantics are
      // bit-identical (oracle re-proven).
      .withColumn("__list",
        coalesce(
          nearestListCol(centroids, col("__cv"), col("__cn"),
            centroids.length > quantizerKernelThreshold),
          lit(-1)))

  private def ivfSearch(
      candidates: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      centroids: Array[(Int, Array[Double])]): DataFrame = {
    val useKernel = centroids.length > quantizerKernelThreshold
    def probeLists(vec: Column, vecNorm: Column, n: Int): Column =
      probeListsCol(centroids, vec, vecNorm, n, useKernel)

    val c = ivfAssign(candidates, idCol, vecCol, centroids)
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", sqrt(dot(col("__qv"), col("__qv"))))
      // zero-norm vectors have no cosine direction: 0/0 = NaN and
      // Spark ranks NaN ABOVE every real sim, so an all-zero embedding
      // would poison rank 1 of every query — exclude them.
      .filter(col("__qn") > 0)
      .withColumn("__list",
        // probes are capped at the CENTROID count: element_at past the
        // ranked array's end is null (non-ANSI) — null probe lists
        // would silently vanish in the join (lost recall, no warning)
        // — or an INVALID_ARRAY_INDEX error under ANSI.
        explode(probeLists(col("__qv"), col("__qn"),
          math.min(nprobe, centroids.length))))
    listJoinTopK(c, q, k)
  }

  /** The shared tail of every IVF search: equi-join assigned
    * candidates with exploded query probes on the list id, exact
    * 6-dp cosine re-rank, per-query top-k. Extracted verbatim from
    * [[ivfSearch]] (identical Columns → identical plans for the
    * frozen paths) so the two-level path below reuses it.
    */
  private def listJoinTopK(c: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val pairs = c.join(q, Seq("__list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    pairs
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  /** Super-centroid count of the two-level quantizer: the smallest
    * integer g with g² ≥ nlist (⌈√nlist⌉). IEEE sqrt is exact on
    * perfect squares and the gap to the next integer (2g−1) is far
    * above sqrt's half-ulp for any Int, so `CEIL(SQRT(nlist))` in SQL
    * derives the identical bound — the rung stays cross-engine.
    */
  def superBound(nlist: Int): Int = {
    require(nlist >= 1, s"nlist must be >= 1: $nlist")
    math.ceil(math.sqrt(nlist.toDouble)).toInt
  }

  /** [[ivfTopKSpread]] with the TWO-LEVEL (hierarchical) coarse
    * quantizer — the corpus-sized shape. Same md5-rank seeds and the
    * same candidate join/re-rank; only HOW each vector finds its
    * list(s) changes:
    *
    * Under [[adaptiveNlist]] (nlist = ⌈n/4096⌉) the FLAT quantizer
    * computes nlist dot products per row — Θ(n²/4096) total, the one
    * quadratic left in this family (traced at rung 147: 600k×147 =
    * 88M dots; 10× the corpus is 100× the work). Here the ⌈√nlist⌉
    * seeds with the smallest md5 ranks (cid < [[superBound]]) act as
    * super-centroids; every centroid belongs to its nearest super
    * ([[graft.functions.TwoLevelIndex.build]], driver-side, same
    * 6-dp/tie arithmetic); a row ranks the supers first, then scans
    * only the `superProbe` nearest supers' member groups — expected
    * (superProbe+1)·√nlist dots per row, Θ(n·√n) total: the curve
    * stays sub-quadratic at any corpus.
    *
    * NOT bit-identical to the flat argmax (a row whose true nearest
    * centroid lives in an unprobed super group lands elsewhere), so
    * this is a SEPARATE operator with its own DuckDB oracle
    * (`graft.IvfProbe` derives the same two-level assignment in SQL)
    * and a measured recall A/B vs the flat path — the frozen
    * `q_sim_ivf` and [[ivfTopKSpread]] are untouched.
    *
    * `superProbe` (queries only; candidate ASSIGNMENT always probes 1
    * super, the standard IVF two-level shape) widens the phase-1 beam:
    * 2 recovers most boundary-of-group recall loss for ~√nlist extra
    * dots per query row. The centroid matrix ships as a real
    * `Broadcast` (once per executor) instead of expression literals —
    * the plan-state residual VERDICT r17 #1(a) named.
    */
  def ivfTopKSpread2(
      candidates: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int, nprobe: Int = 4, superProbe: Int = 2): DataFrame = {
    require(nlist >= 1 && nprobe >= 1 && superProbe >= 1,
      s"nlist/nprobe/superProbe must be >= 1: $nlist/$nprobe/$superProbe")
    val seeds = ivfSeedsSpread(candidates, idCol, vecCol, nlist)
    val index = candidates.sparkSession.sparkContext.broadcast(
      graft.functions.TwoLevelIndex.build(seeds, superBound(nlist)))
    val c = ivfAssign2(candidates, idCol, vecCol, index)
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", sqrt(dot(col("__qv"), col("__qv"))))
      // zero-norm guard — same reason as ivfSearch.
      .filter(col("__qn") > 0)
      .withColumn("__list",
        explode(VectorExprs.topCentroidsTwoLevel(
          col("__qv"), index, math.min(nprobe, seeds.length), superProbe)))
    listJoinTopK(c, q, k)
  }

  /** Two-level assignment frame ([[ivfAssign]]'s shape for the
    * hierarchical quantizer): nearest list id via 1-super probe.
    * Package-private so `graft.IvfProbe` measures list balance on the
    * EXACT assignment the search joins on.
    */
  private[graft] def ivfAssign2(
      candidates: DataFrame, idCol: String, vecCol: String,
      index: org.apache.spark.broadcast.Broadcast[
        graft.functions.TwoLevelIndex]): DataFrame =
    candidates.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", sqrt(dot(col("__cv"), col("__cv"))))
      .filter(col("__cn") > 0)
      // same coalesce(…, -1) single-eval discipline as [[ivfAssign]]
      .withColumn("__list",
        coalesce(
          VectorExprs.topCentroidsTwoLevel(col("__cv"), index, 1, 1)
            .getItem(0),
          lit(-1)))

  /** Reciprocal-rank fusion of two retrievers' ranked lists — the
    * standard score-free way to combine heterogeneous retrieval
    * signals (exact + ANN here; BM25 + dense in a hybrid search
    * stack):
    *
    *   rrf(d) = Σ_lists 1 / (kConst + rank_list(d))
    *
    * RRF needs no score calibration between lists, which is exactly
    * why it wins for fusing an inner-product ranking with a lexical
    * one. `kConst` = 60 is the published default.
    *
    * Inputs are two (query_id, neighbor_id, rnk) frames — the output
    * shape of [[bruteForceTopK]] / [[lshBucketedTopK]] (and of any
    * future lexical retriever). Items missing from one list simply
    * contribute 0 from it.
    *
    * Scale shape: one equi-join on (query, item) between two
    * already-k-bounded candidate lists, then a per-QUERY window over
    * ≤ 2k fused rows — partitioned by query, never global. No
    * all-pairs work happens here; the retrievers own that.
    *
    * Determinism: ranks are exact integers; each contribution is one
    * IEEE division and their two-term sum is order-free; the fused
    * score is floor-quantized to 6 dp BEFORE ranking (decide on the
    * quantized value — [[graft.ext.Drift.psi]] documents the trap) and
    * ties break on neighbor id.
    *
    * Output: (query_id, neighbor_id, rank_a, rank_b, rrf, fused_rank)
    * for fused_rank ≤ topK; rank_a/rank_b null when the item missed
    * that retriever's list.
    */
  def rrfFuse(
      a: DataFrame, b: DataFrame, kConst: Int = 60, topK: Int): DataFrame = {
    require(kConst >= 1, s"kConst must be >= 1: $kConst")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val ra = a.select(
      col("query_id"), col("neighbor_id"), col("rnk").as("rank_a"))
    val rb = b.select(
      col("query_id"), col("neighbor_id"), col("rnk").as("rank_b"))
    def contrib(c: Column) = coalesce(
      lit(1.0) / (lit(kConst.toDouble) + c.cast("double")), lit(0.0))
    val fused = ra.join(rb, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("rrf",
        floor((contrib(col("rank_a")) + contrib(col("rank_b"))) * lit(1e6))
          / lit(1e6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("neighbor_id").asc)
    fused
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= topK)
      .select("query_id", "neighbor_id", "rank_a", "rank_b", "rrf",
        "fused_rank")
  }

  /** Hubness report (Radovanović et al., JMLR'10): the k-occurrence
    * histogram of a retrieval table — for each in-degree d, how many
    * corpus vectors appear as a neighbor in exactly d result lists.
    * High-dimensional embedding spaces grow "hubs" (vectors in
    * everyone's top-k) and "anti-hubs" (in no one's); a long-tailed
    * histogram is the standard diagnostic that cosine retrieval over
    * this embedding will over-serve a few documents — read it next to
    * [[recallAtK]] before trusting an ANN index.
    *
    * `topk` is ANY (query_id, neighbor_id) retrieval table (the
    * [[bruteForceTopK]] / [[lshBucketedTopK]] / [[ivfTopK]] output
    * shape); `ids` is the id universe so zero-degree anti-hubs are
    * counted too. Two bounded aggregates: per-neighbor degree (keyed
    * on the id) then per-degree count (keyed on ≤ max-degree values);
    * the left anti-hub join is id-keyed. Nothing scans pairs twice.
    */
  def hubnessReport(
      topk: DataFrame, ids: DataFrame, idCol: String): DataFrame = {
    val deg = topk.groupBy(col("neighbor_id"))
      .agg(count(lit(1)).as("__d"))
    ids.select(col(idCol).as("neighbor_id"))
      .join(deg, Seq("neighbor_id"), "left")
      .select(coalesce(col("__d"), lit(0L)).as("in_degree"))
      .groupBy(col("in_degree"))
      .agg(count(lit(1)).as("n_vecs"))
  }
}
