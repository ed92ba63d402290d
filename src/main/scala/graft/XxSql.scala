package graft

/** DuckDB-SQL generator for Spark's `xxhash64` — the XXH64 algorithm
  * (seed 42) emulated in exact HUGEINT arithmetic so the two
  * engine-native-hash dedup paths ([[graft.ext.Dedup
  * .minHashNearDuplicates]] / [[graft.ext.Dedup.simHashNearDuplicates]])
  * become fully ORACLE-CHECKABLE instead of rows-only: every 64-bit
  * wrapping multiply is a split multiply mod 2⁶⁴ (a 64×64 product
  * overflows even HUGEINT), rotations are exact div/mul by powers of
  * two, and each hash round is its own MATERIALIZED CTE stage —
  * lateral-alias substitution otherwise grows the expression tree
  * exponentially through the round chain (the kmeans-oracle lesson).
  *
  * Three Spark hash paths are modeled and pinned bit-for-bit against
  * `functions.xxhash64` outputs (see XxSqlSpec):
  *  - strings (UTF-8 bytes via hex(encode()), byte length < 32 — the
  *    corpus' shingles/tokens are ≤ ~26 bytes; longer inputs need the
  *    32-byte block rounds, deliberately unimplemented and loud);
  *  - int literals chained on a prior hash (the per-slot MinHash
  *    seed chain `xxhash64(shingle, i)`);
  *  - long chains (the band hash `xxhash64(slot0, …, slot3)`).
  */
object XxSql {

  private val M64 = "18446744073709551616::HUGEINT"
  private val M32 = "4294967296::HUGEINT"
  private val P1 = "11400714785074694791::HUGEINT"
  private val P2 = "14029467366897019727::HUGEINT"
  private val P3 = "1609587929392839161::HUGEINT"
  private val P4 = "9650029242287828579::HUGEINT"
  private val P5 = "2870177450012600261::HUGEINT"

  /** (a·b) mod 2⁶⁴ for a < 2⁶⁴ — split so no product exceeds 2⁹⁷. */
  private def mm(a: String, b: String): String =
    s"((($a) % $M32) * $b + (((($a) // $M32) * $b) % $M32) * $M32) % $M64"

  private def rotl(x: String, r: Int): String = {
    val lo = BigInt(2).pow(64 - r).toString
    val hi = BigInt(2).pow(r).toString
    s"((($x) % $lo::HUGEINT) * $hi::HUGEINT + (($x) // $lo::HUGEINT))"
  }

  /** fmix as three lateral aliases; emits `{pfx}out`. */
  private def fmixCols(h: String, pfx: String): String =
    s"""${mm(s"xor($h, $h // 8589934592::HUGEINT)", P2)} AS ${pfx}f1,
       |  ${mm(s"xor(${pfx}f1, ${pfx}f1 // 536870912::HUGEINT)", P3)} AS ${pfx}f2,
       |  xor(${pfx}f2, ${pfx}f2 // $M32) AS ${pfx}out""".stripMargin

  private def byteAt(hx: String, i: String): String =
    s"('0x' || substr($hx, ($i)*2+1, 2))::BIGINT::HUGEINT"

  /** CTE stages hashing `valCol` of `src` (byte length < 32) with
    * seed 42; key columns ride along. Returns (cteBlock, finalName);
    * the final CTE carries `{pfx}out` (unsigned HUGEINT).
    */
  def xxstrStages(
      src: String, valCol: String, keyCols: Seq[String],
      pfx: String): (String, String) = {
    val ks = (keyCols :+ valCol).mkString(", ")
    def lane64(o: Int) = "(" + (0 until 8).map(j =>
      s"${byteAt(s"${pfx}hx", (o + j).toString)} * ${BigInt(2).pow(8 * j)}::HUGEINT")
      .mkString(" + ") + ")"
    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // ≥ 32 UTF-8 bytes would need XXH64's 4-accumulator block rounds
    // (deliberately unimplemented) — without this guard an oversize
    // input silently hashes WRONG and only surfaces later as a
    // confusing bit-diff in the dedup gate; error() fails at the
    // point of contract violation instead.
    stages += (s"${pfx}s0" ->
      s"""SELECT $ks,
         |  hex(encode($valCol)) AS ${pfx}hx,
         |  CASE WHEN octet_length(encode($valCol)) >= 32
         |    THEN CAST(error(concat('xxh64 emulation supports <32-byte ',
         |      'inputs; got ', octet_length(encode($valCol)))) AS BIGINT)
         |    ELSE (octet_length(encode($valCol)))::BIGINT END AS ${pfx}n,
         |  (42::HUGEINT + $P5 + (octet_length(encode($valCol)))::HUGEINT)
         |    % $M64 AS ${pfx}h0
         |FROM $src""".stripMargin)
    var prev = s"${pfx}s0"
    var hprev = s"${pfx}h0"
    for ((off, k) <- Seq(0, 8, 16).zipWithIndex) {
      val t = mm(rotl(mm(s"${pfx}l$k", P2), 31), P1)
      val step = s"(${mm(rotl(s"xor($hprev, ${pfx}t$k)", 27), P1)} + $P4) % $M64"
      stages += (s"${pfx}r$k" ->
        s"""SELECT *,
           |  CASE WHEN ${pfx}n >= ${off + 8} THEN ${lane64(off)}
           |    ELSE 0::HUGEINT END AS ${pfx}l$k,
           |  CASE WHEN ${pfx}n >= ${off + 8} THEN $t
           |    ELSE 0::HUGEINT END AS ${pfx}t$k,
           |  CASE WHEN ${pfx}n >= ${off + 8} THEN $step
           |    ELSE $hprev END AS ${pfx}h${k + 1}
           |FROM $prev""".stripMargin)
      prev = s"${pfx}r$k"
      hprev = s"${pfx}h${k + 1}"
    }
    val o4 = s"((${pfx}n // 8) * 8)"
    val l32 = "(" + (0 until 4).map(j =>
      s"${byteAt(s"${pfx}hx", s"$o4+$j")} * ${BigInt(2).pow(8 * j)}::HUGEINT")
      .mkString(" + ") + ")"
    val t4 = mm(s"${pfx}l4", P1)
    val step4 = s"(${mm(rotl(s"xor($hprev, ${pfx}t4)", 23), P2)} + $P3) % $M64"
    stages += (s"${pfx}r4" ->
      s"""SELECT *,
         |  CASE WHEN ${pfx}n % 8 >= 4 THEN $l32 ELSE 0::HUGEINT END AS ${pfx}l4,
         |  CASE WHEN ${pfx}n % 8 >= 4 THEN $t4 ELSE 0::HUGEINT END AS ${pfx}t4,
         |  CASE WHEN ${pfx}n % 8 >= 4 THEN $step4 ELSE $hprev END AS ${pfx}h4
         |FROM $prev""".stripMargin)
    prev = s"${pfx}r4"
    hprev = s"${pfx}h4"
    for (k <- 0 until 3) {
      val off = s"(${pfx}n - (${pfx}n % 4) + $k)"
      val t = mm(byteAt(s"${pfx}hx", off), P5)
      val step = mm(rotl(s"xor($hprev, ${pfx}u$k)", 11), P1)
      stages += (s"${pfx}q$k" ->
        s"""SELECT *,
           |  CASE WHEN ${pfx}n % 4 > $k THEN $t ELSE 0::HUGEINT END AS ${pfx}u$k,
           |  CASE WHEN ${pfx}n % 4 > $k THEN $step ELSE $hprev END AS ${pfx}h${5 + k}
           |FROM $prev""".stripMargin)
      prev = s"${pfx}q$k"
      hprev = s"${pfx}h${5 + k}"
    }
    stages += (s"${pfx}fx" -> s"SELECT *,\n  ${fmixCols(hprev, pfx)}\nFROM $prev")
    (stages.map { case (n, q) => s"$n AS MATERIALIZED (\n$q)" }
      .mkString(",\n"), s"${pfx}fx")
  }

  /** hashInt(i, seed) lateral columns (constant i); emits `{pfx}out`. */
  def hashIntCols(i: Int, seedCol: String, pfx: String): String = {
    val lo = i.toLong & 0xffffffffL
    val a = s"($seedCol + $P5 + 4::HUGEINT) % $M64"
    val b = mm(s"$lo::HUGEINT", P1)
    val c = s"(${mm(rotl(s"xor(${pfx}a, ${pfx}b)", 23), P2)} + $P3) % $M64"
    s"""$a AS ${pfx}a,
       |  $b AS ${pfx}b,
       |  $c AS ${pfx}c,
       |  ${fmixCols(s"${pfx}c", pfx)}""".stripMargin
  }

  /** hashLong(l, seed) lateral columns; emits `{pfx}out`. */
  def hashLongCols(lExpr: String, seedExpr: String, pfx: String): String = {
    val b = mm(rotl(mm(lExpr, P2), 31), P1)
    val c = s"(${mm(rotl(s"xor(${pfx}a, ${pfx}b)", 27), P1)} + $P4) % $M64"
    s"""($seedExpr + $P5 + 8::HUGEINT) % $M64 AS ${pfx}a,
       |  $b AS ${pfx}b,
       |  $c AS ${pfx}c,
       |  ${fmixCols(s"${pfx}c", pfx)}""".stripMargin
  }

  def toSigned(u: String): String =
    s"""CASE WHEN $u >= 9223372036854775808::HUGEINT
       | THEN ($u - $M64)::BIGINT ELSE ($u)::BIGINT END""".stripMargin
      .replace("\n", "")

  def toUnsigned(s: String): String =
    s"(CASE WHEN $s < 0 THEN ($s)::HUGEINT + $M64 ELSE ($s)::HUGEINT END)"

  /** Full oracle for the xxhash64 MinHash LSH near-dup query
    * (numHashes=16, bands=4, shingleN=3, verified-jaccard threshold).
    */
  def minHashFastOracleSql(threshold: Double): String = {
    val (xblock, xfinal) = xxstrStages("ds", "t", Seq.empty, "x")
    val hi = (0 until 16).map(i => hashIntCols(i, "xout", s"g${i}_"))
      .mkString(",\n  ")
    val sigMins = (0 until 16).map(i =>
      s"MIN(${toSigned(s"g${i}_out")}) AS s$i").mkString(",\n    ")
    var prev = "sigs"
    val bandStages = (0 until 4).map { step =>
      val cols = (0 until 4).map { k =>
        hashLongCols(toUnsigned(s"s${4 * k + step}"),
          if (step == 0) "42::HUGEINT" else s"b${k}_${step - 1}_out",
          s"b${k}_${step}_")
      }.mkString(",\n  ")
      val stage = s"bs$step AS MATERIALIZED (\nSELECT *,\n  $cols\nFROM $prev)"
      prev = s"bs$step"
      stage
    }.mkString(",\n")
    val bandU = (0 until 4).map(k =>
      s"SELECT doc_id, $k AS band, ${toSigned(s"b${k}_3_out")} AS bandhash " +
        s"FROM $prev").mkString(" UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, str_split(trim(lower(text)), ' ') AS tk FROM documents),
       |tt AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, len(tk) - 2),
       |    i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS shingles
       |  FROM toks),
       |e AS (SELECT doc_id, unnest(shingles) AS t FROM tt),
       |ds AS (SELECT DISTINCT t FROM e),
       |$xblock,
       |hi AS MATERIALIZED (SELECT t,
       |  $hi
       |FROM $xfinal),
       |sigs AS MATERIALIZED (
       |  SELECT e.doc_id,
       |    $sigMins
       |  FROM e JOIN hi USING (t) GROUP BY e.doc_id),
       |$bandStages,
       |banded AS ($bandU),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bandhash = b.bandhash
       |      AND a.doc_id < b.doc_id),
       |j AS (
       |  SELECT c.id_a, c.id_b,
       |    CAST(len(list_intersect(ta.shingles, tb.shingles)) AS DOUBLE)
       |      / CAST(len(ta.shingles) + len(tb.shingles)
       |          - len(list_intersect(ta.shingles, tb.shingles)) AS DOUBLE)
       |      AS jaccard
       |  FROM cand c
       |  JOIN tt ta ON ta.doc_id = c.id_a
       |  JOIN tt tb ON tb.doc_id = c.id_b)
       |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= $threshold""".stripMargin
  }

  /** Full oracle for the xxhash64 SimHash near-dup query. */
  def simHashFastOracleSql(maxDist: Int): String = {
    val (xblock, xfinal) = xxstrStages("ds", "t", Seq.empty, "x")
    val width = 64 / (maxDist + 1)
    val setCols = (0 until 64).map(i =>
      s"SUM(((h.xout // ${BigInt(2).pow(i)}::HUGEINT) % 2)::BIGINT) AS c$i")
      .mkString(",\n    ")
    val sig = (0 until 64).map(i =>
      s"(CASE WHEN 2*c$i > n THEN ${BigInt(2).pow(i)}::HUGEINT " +
        "ELSE 0::HUGEINT END)").mkString(" + ")
    val bandU = (0 to maxDist).map(b =>
      s"SELECT doc_id, sig, $b AS band, ((sig // " +
        s"${BigInt(2).pow(b * width)}::HUGEINT) % ${1 << width}) AS bits " +
        "FROM sigs").mkString(" UNION ALL ")
    s"""WITH occ AS (
       |  SELECT doc_id, unnest(str_split(trim(lower(text)), ' ')) AS t
       |  FROM documents),
       |ds AS (SELECT DISTINCT t FROM occ),
       |$xblock,
       |h AS MATERIALIZED (SELECT t, xout FROM $xfinal),
       |votes AS MATERIALIZED (
       |  SELECT occ.doc_id, COUNT(*) AS n,
       |    $setCols
       |  FROM occ JOIN h USING (t) GROUP BY occ.doc_id),
       |sigs AS MATERIALIZED (
       |  SELECT doc_id, ($sig) AS sig FROM votes),
       |banded AS ($bandU),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= $maxDist""".stripMargin
  }
}
