package graft.ext

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def splitOf(id: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.substring(0, 15)
    val b = java.lang.Long.parseLong(hex, 16) % 100
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  test("disposition: quality gate, then min-id near-dup collapse, " +
    "then hash split — one verdict per doc") {
    val good1 = "the cat and the dog have fun with food today"
    val good2 = "big ships that sail with the wind move far today yes"
    val docs = Seq(
      (1L, good1),
      (2L, good1),      // exact near-dup of 1 -> loses to min id
      (3L, "xx yy"),    // too short -> quality reject
      (4L, good2))
      .toDF("doc_id", "text")
    val out = Curation.disposition(docs, "doc_id", "text")
      .as[(Long, Boolean, Boolean, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((true, true, splitOf(1L))))
    assert(out(2L) === ((true, false, "rejected_duplicate")))
    assert(out(3L)._1 === false)
    assert(out(3L)._3 === "rejected_quality")
    assert(out(4L) === ((true, true, splitOf(4L))))
  }

  test("gateAblation: any vs sole failure counts and the __all__ row") {
    val flags = Seq(
      // (a, b, c): doc1 passes all; doc2 fails only a; doc3 fails a+b;
      // doc4 fails only c; doc5 fails all three.
      (true, true, true),
      (false, true, true),
      (false, false, true),
      (true, true, false),
      (false, false, false))
      .toDF("a", "b", "c")
    val out = Curation.gateAblation(flags, Seq("a", "b", "c"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("a") === ((3L, 1L))) // fails: 2,3,5; sole: 2
    assert(out("b") === ((2L, 0L))) // fails: 3,5; never alone
    assert(out("c") === ((2L, 1L))) // fails: 4,5; sole: 4
    assert(out("__all__") === ((5L, 1L))) // 5 docs, 1 passes all
  }
}
