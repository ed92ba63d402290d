package graft.ext

import graft.SparkSpec

class VocabSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "spark spark spark join"),
    (1L, "spark join shuffle"),
    (2L, "shuffle shuffle sort"))
    .toDF("doc_id", "text")

  test("topVocabulary counts occurrences and doc frequency") {
    val out = Vocab.topVocabulary(docs, "doc_id", "text", 10)
      .as[(String, Long, Long)].collect().toList
    assert(out === List(
      ("spark", 4L, 2L),   // 4 occurrences in 2 docs
      ("shuffle", 3L, 2L),
      ("join", 2L, 2L),
      ("sort", 1L, 1L)))
  }

  test("topVocabulary limit keeps the ordered head") {
    val out = Vocab.topVocabulary(docs, "doc_id", "text", 2)
      .as[(String, Long, Long)].collect().toList
    assert(out.map(_._1) === List("spark", "shuffle"))
  }

  test("topTfIdfTerm picks each doc's highest-scoring term deterministically") {
    val out = Vocab.topTfIdfTerm(docs, "doc_id", "text")
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // doc 0: spark tf=3 but df=2; ln(3/2)*3 > others -> spark
    assert(out(0L) === "spark")
    // doc 2: shuffle tf=2 df=2 -> 2*ln(1.5)=0.81 vs sort tf=1 df=1 -> ln(3)=1.10
    assert(out(2L) === "sort")
    // doc 1: all tf=1, df=2 everywhere -> equal scores; tiebreak term asc
    assert(out(1L) === "join")
  }

  test("unigramSurprisal: corpus-frequency mean negative log-likelihood") {
    val tiny = Seq((0L, "a a b"), (1L, "b c")).toDF("doc_id", "text")
    // T=5; p(a)=p(b)=2/5, p(c)=1/5; nll(a)=nll(b)=round(-ln(0.4),6)=0.916291
    val out = Vocab.unigramSurprisal(tiny, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(0L)._1 === 3L)
    assert(out(0L)._2 === 0.916291) // all three tokens share the same nll
    assert(out(1L)._1 === 2L)
    val expected1 = (0.916291 + math.rint(-math.log(0.2) * 1e6) / 1e6) / 2
    assert(math.abs(out(1L)._2 - expected1) < 2e-6)
    // rare-junk doc scores higher than common-token doc
    assert(out(1L)._2 > out(0L)._2)
  }

  test("tfidf values are rounded 6dp and exactly one row per doc") {
    val out = Vocab.topTfIdfTerm(docs, "doc_id", "text").collect()
    assert(out.length === 3)
    val score = Vocab.topTfIdfTerm(docs, "doc_id", "text")
      .filter($"doc_id" === 0L).select("tfidf").as[Double].head()
    assert(math.abs(score - 3.0 * math.log(3.0 / 2.0)) < 1e-6)
  }

  test("bm25TopK ranks by the exact formula and skips query-free docs") {
    val corpus = Seq(
      (0L, "spark spark spark filter"),  // tf=3, short
      (1L, "spark join group order sort window table line batch"), // tf=1, long
      (2L, "nothing relevant here at all")
    ).toDF("doc_id", "text")
    val out = Vocab.bm25TopK(corpus, "doc_id", "text", Seq("spark"), k = 10)
      .as[(Long, Double, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(0L, 1L)) // doc 2 absent, 0 outranks 1
    // hand-check doc 0: N=3, df=2, dl=4, avgdl = (4+9+5)/3 = 6
    val idf = math.log(1.0 + (3.0 - 2 + 0.5) / (2 + 0.5))
    val s0 = idf * 3 * 2.2 / (3 + 1.2 * (0.25 + 0.75 * 4.0 / 6.0))
    assert(math.abs(out.head._2 - s0) < 2e-6)
    assert(out.map(_._3).toSeq == Seq(1L, 2L))
  }

  test("bm25TopK keeps k bounded and ties deterministic") {
    // 20 identical docs: identical scores, ties broken by doc_id asc
    val corpus = (0L until 20L).map(i => (i, "spark query")).toDF("doc_id", "text")
    val out = Vocab.bm25TopK(corpus, "doc_id", "text", Seq("spark"), k = 5)
      .as[(Long, Double, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // aggregation-shaped plan: bounded heap, no global-order window
    val plan = Vocab.bm25TopK(corpus, "doc_id", "text", Seq("spark"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("bigramSurprisal: conditional MLE negative log-likelihood") {
    val tiny = Seq((0L, "a b a b"), (1L, "a b c")).toDF("doc_id", "text")
    // bigram counts: (a,b)=3, (b,a)=1, (b,c)=1; contexts: a=3, b=2
    // nll(b|a) = -ln(1) = 0; nll(a|b) = nll(c|b) = round(ln 2, 6)
    val ln2 = math.rint(math.log(2.0) * 1e6) / 1e6
    val out = Vocab.bigramSurprisal(tiny, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(0L)._1 === 3L) // "a b a b" has 3 bigram positions
    assert(math.abs(out(0L)._2 - ln2 / 3) < 2e-6)
    assert(out(1L)._1 === 2L)
    assert(math.abs(out(1L)._2 - ln2 / 2) < 2e-6)
  }

  test("bigramSurprisal drops docs with fewer than two tokens") {
    val tiny = Seq((0L, "solo"), (1L, ""), (2L, "a b"))
      .toDF("doc_id", "text")
      .union(Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val out = Vocab.bigramSurprisal(tiny, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(2L))
  }

  test("bigramSurprisal shuffled-word junk scores above natural repetition") {
    // Same unigram bag; doc 11's bigrams are corpus-rare
    val corpus = (0L to 9L).map(i => (i, "the cat sat on the mat")) :+
      (10L, "the cat sat on the mat") :+ (11L, "mat the on sat cat the")
    val out = Vocab.bigramSurprisal(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "bigram_surprisal").as[(Long, Double)].collect().toMap
    assert(out(11L) > out(10L))
  }

  test("zipfFit recovers the exponent of a constructed Zipfian corpus") {
    // token t_i appears floor(1000/i) times -> ln f = ln 1000 - 1.0 ln r
    val text = (1 to 50).flatMap(i => Seq.fill(1000 / i)(f"t$i%03d"))
    val corpus = Seq((0L, text.mkString(" "))).toDF("doc_id", "text")
    val out = Vocab.zipfFit(corpus, "doc_id", "text", k = 50)
      .select("n_terms", "slope").as[(Long, Double)].head()
    assert(out._1 === 50L)
    assert(math.abs(out._2 - (-1.0)) < 0.05, s"slope=${out._2}")
  }

  test("zipfFit flat frequencies give slope ~ 0") {
    val corpus = Seq((0L, (1 to 30).map(i => s"w$i w$i w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val slope = Vocab.zipfFit(corpus, "doc_id", "text", k = 30)
      .select("slope").as[Double].head()
    assert(math.abs(slope) < 1e-9, s"slope=$slope")
  }

  test("zipfFit plans NO window — heap rank survives vocabulary cardinality") {
    // 2000 distinct tokens, k=20: the old row_number() form put the
    // whole vocabulary through a single-partition WindowExec; the heap
    // keeps ≤ k entries per map task and array position IS the rank.
    val text = (1 to 2000).flatMap(i => Seq.fill(i % 5 + 1)(f"tok$i%04d"))
    val corpus = Seq((0L, text.mkString(" "))).toDF("doc_id", "text")
    val q = Vocab.zipfFit(corpus, "doc_id", "text", k = 20)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rank window found:\n$plan")
    assert(q.select("n_terms").as[Long].head() === 20L)
  }

  test("hashedFeatures: stable buckets in range, counts preserved") {
    val tiny = Seq((0L, "a b a"), (1L, "a c")).toDF("doc_id", "text")
    val out = Vocab.hashedFeatures(tiny, "doc_id", "text", 64)
      .as[(Long, Long, Long)].collect()
    assert(out.forall { case (_, b, _) => b >= 0 && b < 64 })
    // token counts survive the bucketing (5 tokens total)
    assert(out.map(_._3).sum === 5L)
    // same token -> same bucket in every doc
    val aBuckets = Vocab.hashedFeatures(
      Seq((0L, "a"), (1L, "a")).toDF("doc_id", "text"), "doc_id", "text", 64)
      .select("bucket").as[Long].collect().toSet
    assert(aBuckets.size === 1)
  }

  test("bigramSurprisal runs both count-windows on one exchange") {
    val tiny = Seq((0L, "a b c"), (1L, "b c d")).toDF("doc_id", "text")
    val plan = Vocab.bigramSurprisal(tiny, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // tf groupBy + shared window exchange + final doc groupBy = 3;
    // an unshared (w1,w2) window would add a fourth
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n === 3, s"expected 3 hash exchanges, got $n:\n$plan")
  }

  test("pmiCollocations: hand-computed PMI with rounded-score ranking") {
    val tiny = Seq(
      (0L, "new york new york"), (1L, "new deal"), (2L, "york city"))
      .toDF("doc_id", "text")
    val out = Vocab.pmiCollocations(tiny, "text", minCount = 1L, k = 10)
      .as[(String, String, Long, Long, Long, Double)].collect().toList
    // N=5. (new,york): 2*5/(3*2) -> ln(5/3); (york,new): 1*5/(2*1) -> ln(2.5)
    // (new,deal): 1*5/(3*1) -> ln(5/3); (york,city): 1*5/(2*1) -> ln(2.5)
    val ln53 = math.rint(math.log(5.0 / 3.0) * 1e6) / 1e6
    val ln25 = math.rint(math.log(2.5) * 1e6) / 1e6
    assert(out === List(
      ("york", "city", 1L, 2L, 1L, ln25),
      ("york", "new", 1L, 2L, 1L, ln25),
      ("new", "deal", 1L, 3L, 1L, ln53),
      ("new", "york", 2L, 3L, 2L, ln53)))
  }

  test("pmiCollocations: minCount floor drops hapax pairs before ranking") {
    val tiny = Seq(
      (0L, "new york new york"), (1L, "new deal"), (2L, "york city"))
      .toDF("doc_id", "text")
    val out = Vocab.pmiCollocations(tiny, "text", minCount = 2L, k = 10)
      .select("w1", "w2").as[(String, String)].collect().toList
    assert(out === List(("new", "york")))
  }

  test("sourceKlMatrix: KL of identical distributions is ~0, " +
    "disjoint-vocabulary sources diverge, matrix is complete") {
    val docs = Seq(
      (1L, "alpha beta alpha beta", "s1"),
      (2L, "alpha beta alpha beta", "s2"),   // identical dist to s1
      (3L, "gamma delta gamma delta", "s3")) // disjoint vocabulary
      .toDF("doc_id", "text", "source")
    val out = Vocab.sourceKlMatrix(docs, "source", "text")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out.size === 6, "3 sources -> 6 ordered pairs")
    // identical distributions: every term_q is floor(p*ln(1)=0) = 0
    assert(out(("s1", "s2")) === 0L)
    assert(out(("s2", "s1")) === 0L)
    // disjoint vocab: strictly positive divergence both ways
    assert(out(("s1", "s3")) > 0L && out(("s3", "s1")) > 0L)
    // divergent pairs dominate the near-identical pair
    assert(out(("s1", "s3")) > out(("s1", "s2")))
  }

  test("oovRate: boundary ties cut deterministically; oov is exact") {
    // Counts: aa x4, bb x4, cc x2, zz x2 -> top-2 vocab must be
    // {aa, bb}; cc/zz tie below the cut is irrelevant at k=2.
    val docs = Seq(
      (1L, "aa bb aa bb"), (2L, "aa bb cc zz"), (3L, "aa bb cc zz"))
      .toDF("doc_id", "text")
    val out = Vocab.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === Map(
      1L -> ((4L, 0L, 0.0)),
      2L -> ((4L, 2L, 0.5)),
      3L -> ((4L, 2L, 0.5))))
    // k=3: the cc/zz tie resolves lexicographically -> cc in, zz out.
    val out3 = Vocab.oovRate(docs, "doc_id", "text", vocabSize = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out3 === Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("perplexityBuckets: exact integer tertile cuts, all scored docs " +
    "bucketed, repetitive low-surprisal docs land in head") {
    // 9 docs over 3 sources: 3 docs of a single repeated common token
    // (minimal surprisal), 3 mixed, 3 of unique-per-doc rare tokens
    // (maximal surprisal). 9 ranks -> exactly 3 per bucket.
    val docs = (0L until 9L).map { i =>
      val text = i % 3 match {
        case 0 => "the the the the"
        case 1 => s"the of and tok$i"
        case _ => s"zq${i}a zq${i}b zq${i}c zq${i}d"
      }
      (i, text, s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
    val out = Vocab.perplexityBuckets(docs, "doc_id", "text", "source")
      .as[(String, String, Long, Long)].collect().toList.sorted
    // Each source holds exactly one surprisal class of 3 docs here, so
    // each (source, bucket) cell is whole: 3 docs x 4 tokens.
    assert(out === List(
      ("src0", "head", 3L, 12L),
      ("src1", "middle", 3L, 12L),
      ("src2", "tail", 3L, 12L)))
  }

  test("perplexityBuckets: bucket sizes follow the 3r<=n integer rule " +
    "when n is not divisible by 3") {
    val docs = (0L until 10L).map(i => (i, s"w$i common", "s"))
      .toDF("doc_id", "text", "source")
    val sizes = Vocab.perplexityBuckets(docs, "doc_id", "text", "source")
      .groupBy("bucket").agg(org.apache.spark.sql.functions.sum("n_docs"))
      .as[(String, Long)].collect().toMap
    // n=10: head r<=3 (3r<=10), middle r<=6, tail r>6 -> 3/3/4.
    assert(sizes === Map("head" -> 3L, "middle" -> 3L, "tail" -> 4L))
  }

  test("kneserNeyBigram: hand-computed smoothed probabilities") {
    // corpus: "a b", "a b", "a c" -> types (a,b) c=2, (a,c) c=1; B=2;
    // c(a.)=3, N1+(a,.)=2, N1+(.,b)=N1+(.,c)=1.
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val out = Vocab.kneserNeyBigram(docs, "text")
      .as[(String, String, Long, Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val ab = out(("a", "b"))
    assert((ab._3, ab._4, ab._5, ab._6) === ((2L, 3L, 2L, 1L)))
    val pAb = ab._7
    // (2-0.75)/3 + (0.75*2/3)*(1/2) = 5/12 + 1/4 = 2/3
    assert(math.abs(pAb - 2.0 / 3.0) < 1e-12)
    val pAc = out(("a", "c"))._7
    // (1-0.75)/3 + (0.75*2/3)*(1/2) = 1/12 + 1/4 = 1/3
    assert(math.abs(pAc - 1.0 / 3.0) < 1e-12)
    // full observed continuation mass of 'a' is conserved here
    assert(math.abs(pAb + pAc - 1.0) < 1e-12)
  }

  test("kneserNeyBigram: continuation beats raw frequency for " +
    "context-narrow words") {
    // "x" follows ONLY "of" (high count, one context); "y" follows
    // three different contexts with count 1 each. KN gives y the
    // higher continuation share even though x is 3x more frequent.
    val docs = Seq(
      (1L, "of x of x of x"),
      (2L, "p y"), (3L, "q y"), (4L, "r y"))
      .toDF("doc_id", "text")
    val out = Vocab.kneserNeyBigram(docs, "text")
      .select("w2", "n1p_bwd").distinct()
      .as[(String, Long)].collect().toMap
    assert(out("x") === 1L && out("y") === 3L)
  }

  test("heapsFit matches the exact-integer scalar model and is " +
    "partition-invariant") {
    val texts = Seq(
      (1L, "a b c d"), (2L, "a b e f g"), (3L, "a h"), (4L, "i j k a b"),
      (5L, "l m"), (6L, "a b c n o p"))
    val docs = texts.toDF("doc_id", "text")
    // scalar model: cumulative tokens / first-seen vocab in doc order
    var seen = Set.empty[String]
    var (ct, cv) = (0L, 0L)
    val pts = texts.map { case (_, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      ct += ws.length
      cv += ws.count(w => { val fresh = !seen(w); seen += w; fresh })
      (ct, cv)
    }
    val xq = pts.map(p =>
      BigInt(math.floor(
        graft.functions.DetMath.lnqDouble(p._1.toDouble) * 1e6).toLong))
    val yq = pts.map(p =>
      BigInt(math.floor(
        graft.functions.DetMath.lnqDouble(p._2.toDouble) * 1e6).toLong))
    val n = BigInt(pts.size)
    val (sx, sy) = (xq.sum, yq.sum)
    val sxx = xq.map(v => v * v).sum
    val sxy = xq.zip(yq).map { case (a, b) => a * b }.sum
    val numer = n * sxy - sx * sy
    val denom = n * sxx - sx * sx
    val betaQ = (numer * 1000000) / denom // BigInt / truncates
    val lnkQ = (sy * denom - numer * sx) / (n * denom)
    val got = Vocab.heapsFit(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(got === ((pts.size.toLong, betaQ.toLong, lnkQ.toLong,
      betaQ.toLong / 1e6, lnkQ.toLong / 1e6)))
    val got16 = Vocab.heapsFit(docs.repartition(16), "doc_id", "text")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(got16 === got)
  }

  test("bm25Rm3: expansion comes from feedback docs and lifts docs " +
    "sharing only expansion terms into the results") {
    // 'target' docs contain the query term; they all also contain
    // 'special'; a disjoint doc contains ONLY 'special' and can rank
    // in round 2 alone.
    val docs = (
      (0L until 5L).map(i => (i, "query special words here")) ++
      Seq((10L, "special special content no q-term")) ++
      (20L until 40L).map(i => (i, s"filler f$i things"))
    ).toDF("doc_id", "text")
    val out = Vocab.bm25Rm3(docs, "doc_id", "text",
      Seq("query"), k = 10, fbDocs = 3, fbTerms = 2)
    val rows = out.as[(Long, Double, Long, String)].collect()
    val expansion = rows.head._4.split(",").toSet
    assert(expansion.contains("special"), s"expansion: $expansion")
    assert(rows.map(_._1).contains(10L),
      "doc matching only expansion terms must enter round 2")
  }
}
