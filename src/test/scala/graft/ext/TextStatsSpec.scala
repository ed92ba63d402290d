package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("token counts over whitespace tokens") {
    val df = Seq("the quick fox", "  padded  ", "one").toDF("t")
    val out = df.select(TextStats.tokenCount(col("t")).as("n")).as[Int].collect()
    // "  padded  " trims to one token; note double-space inside would differ —
    // testdata is single-spaced.
    assert(out.toSeq === Seq(3, 1, 1))
  }

  test("unique token count deduplicates") {
    val n = Seq("a b a b c").toDF("t")
      .select(TextStats.uniqueTokenCount(col("t"))).as[Int].head()
    assert(n === 3)
  }

  test("bpe-ish tokens split letter runs, digit runs, and punctuation") {
    val n = Seq("hello, world42!").toDF("t")
      .select(TextStats.bpeishTokenCount(col("t"))).as[Int].head()
    // hello , world 42 ! -> 5
    assert(n === 5)
  }

  test("stopword ratio and language id") {
    val df = Seq(
      "the cat sat on the mat",          // 3/6 stopwords -> en
      "zork blug frop klam").toDF("t")   // 0 stopwords -> unk
    val out = df.select(
      TextStats.stopwordRatio(col("t")).as("r"),
      TextStats.langId(col("t")).as("l")).as[(Double, String)].collect()
    assert(out(0)._1 === 0.5 && out(0)._2 === "en")
    assert(out(1)._1 === 0.0 && out(1)._2 === "unk")
  }

  test("quality score is in [0,1] and rewards longer natural text") {
    val df = Seq(
      ("short", "ok go"),
      ("long", ("the point of this considerably longer document is that it " +
        "keeps going with many words and the usual amount of the stopwords " +
        "that a natural document would have in it ") * 3))
      .toDF("k", "t")
    val m = df.select(col("k"), TextStats.qualityScore(col("t")).as("q"))
      .as[(String, Double)].collect().toMap
    assert(m.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(m("long") > m("short"))
  }

  test("quality score rounds a TRUE half boundary half-up, exactly") {
    // 192 tokens, 1 stopword: (sw/t)·0.3·10⁶ = 300000/192 = 1562.5 —
    // the exact tie that split Spark round(double) from the oracle
    // engine in r06. The integer definition has one answer: half-up
    // 1563, so score = (7000·100 + 1563)/10⁶ exactly.
    val text = (Seq.fill(191)("w") :+ "the").mkString(" ")
    val q = Seq(text).toDF("t")
      .select(TextStats.qualityScore(col("t")).as("q"))
      .as[Double].head()
    assert(q == 701563.0 / 1e6)
  }

  test("fingerprint is md5 of utf-8; normalized fp is order/dup invariant") {
    val df = Seq(
      ("a", "the quick brown fox"),
      ("b", "fox brown quick the"),       // permuted -> same norm_fp
      ("c", "the the quick brown fox"),   // dup token -> same norm_fp
      ("d", "a different text")).toDF("k", "t")
    val rows = df.select(col("k"),
      TextStats.fingerprint(col("t")).as("fp"),
      TextStats.normalizedFingerprint(col("t")).as("nfp"))
      .as[(String, String, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(rows("a")._1 !== rows("b")._1)
    assert(rows("a")._2 === rows("b")._2)
    assert(rows("a")._2 === rows("c")._2)
    assert(rows("a")._2 !== rows("d")._2)
    // md5 well-known vector
    val known = Seq(Tuple1("abc")).toDF("t")
      .select(TextStats.fingerprint(col("t"))).as[String].head()
    assert(known === "900150983cd24fb0d6963f7d28e17f72")
  }

  test("winnowing: shared run of >= k+w-1 tokens shares a fingerprint") {
    // k=3, w=4 -> any shared run of 6 tokens must yield a common print.
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"unrelated prefix words here $shared"),
      (2L, s"$shared completely other suffix tokens"),
      (3L, "nothing in common with either document at all"),
      (4L, "tiny doc"), // < k tokens -> no fingerprints
      (5L, "one two three")) // exactly k tokens -> 1 gram -> 1 print
      .toDF("doc_id", "text")
    val fp = TextStats.winnowingFingerprints(df, "doc_id", "text")
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    assert((fp(1L) & fp(2L)).nonEmpty)        // guarantee holds
    assert((fp(1L) & fp(3L)).isEmpty)          // no spurious overlap
    assert(!fp.contains(4L))                   // too short: no prints
    assert(fp(5L).size === 1)                  // whole doc = one window
  }

  test("repetitionMetrics: token/bigram repetition fractions") {
    val df = Seq(
      (0L, "spam spam spam spam"),       // fully repetitive
      (1L, "all tokens here distinct"),  // no repetition
      (2L, "a b a b a b"),               // repeated bigram pattern
      (3L, "solo"))                      // single token: no bigrams
      .toDF("doc_id", "text")
    val out = TextStats.repetitionMetrics(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    // doc 0: 4 tokens, top=4/4, dup=1-1/4, bigrams: 3 total 1 distinct
    assert(out(0L) === ((4L, 1.0, 0.75, Some(0.666667))))
    assert(out(1L) === ((4L, 0.25, 0.0, Some(0.0))))
    // doc 2: 6 tokens, top a=3 -> 0.5, dup=1-2/6, bigrams 5 total 2 distinct
    assert(out(2L)._2 === 0.5)
    assert(out(2L)._4 === Some(0.6))
    assert(out(3L) === ((1L, 1.0, 0.0, None)))
  }

  test("tokenWindowChunks: overlapping windows, short tail, full coverage") {
    val df = Seq(
      (0L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 toks, size 4 stride 2
      (1L, "a b c"),                          // shorter than size -> 1 chunk
      (2L, "x"))
      .toDF("doc_id", "text")
    val out = TextStats.tokenWindowChunks(df, "doc_id", "text", 4, 2)
      .select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens")
      .as[(Long, Long, String, Long)].collect().toSet
    // doc 0: starts advance by stride 2:
    // (len-size+stride-1)/stride+1 = (10-4+1)/2+1 = 3+1 = 4: starts 0,2,4,6
    assert(out.filter(_._1 == 0L) === Set(
      (0L, 0L, "t0 t1 t2 t3", 4L), (0L, 1L, "t2 t3 t4 t5", 4L),
      (0L, 2L, "t4 t5 t6 t7", 4L), (0L, 3L, "t6 t7 t8 t9", 4L)))
    assert(out.filter(_._1 == 1L) === Set((1L, 0L, "a b c", 3L)))
    assert(out.filter(_._1 == 2L) === Set((2L, 0L, "x", 1L)))
    // coverage: every source token appears in some chunk
    val covered = out.filter(_._1 == 0L).flatMap(_._3.split(" "))
    assert(covered === (0 until 10).map(i => s"t$i").toSet)
  }

  test("tokenWindowChunks: short-tail chunk when stride doesn't divide") {
    val df = Seq((0L, "t0 t1 t2 t3 t4")).toDF("doc_id", "text") // 5 toks
    val out = TextStats.tokenWindowChunks(df, "doc_id", "text", 4, 2)
      .select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens")
      .as[(Long, Long, String, Long)].collect().toSet
    // n = (5-4+1)/2+1 = 2: starts 0,2 -> second chunk is 3 tokens
    assert(out === Set(
      (0L, 0L, "t0 t1 t2 t3", 4L), (0L, 1L, "t2 t3 t4", 3L)))
  }

  test("gopherRules: each rule trips on its designed violation") {
    val good = "the cat and the dog have fun with food today yes"
    val docs = Seq(
      (0L, good),                                   // passes all
      (1L, "the of"),                               // too few words
      (2L, "a b c d e f g the of to and"),          // mean word len < 3
      (3L, "the# cat# and# dog# have# fun# with#"), // >10% symbol words
      (4L, "111 222 333 444 555 the of 666 777 888"), // <80% alpha words
      (5L, "cats dogs birds mice fish horses goats")) // <2 stopwords
      .toDF("doc_id", "text")
    val out = TextStats.gopherRules(docs, "doc_id", "text")
      .as[(Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(0L)._8, "control doc must pass")
    assert(!out(1L)._3 && !out(1L)._8)
    assert(!out(2L)._4 && !out(2L)._8)
    assert(!out(3L)._5 && !out(3L)._8)
    assert(!out(4L)._6 && !out(4L)._8)
    assert(!out(5L)._7 && !out(5L)._8)
  }
}
