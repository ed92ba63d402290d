package graft.ext

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  // benchmark holds "d e f g h"; corpus docs overlap it to varying degrees
  private lazy val bench = Seq((100L, "d e f g h")).toDF("doc_id", "text")
  private lazy val corpus = Seq(
    (0L, "a b c d e f g h i"), // contains all benchmark 3-grams d-e-f e-f-g f-g-h
    (1L, "a b c x y z"),       // zero overlap
    (2L, "d e f q r s"),       // one shared 3-gram (d e f)
    (3L, "xy"))                // shorter than n -> no ngrams
    .toDF("doc_id", "text")

  test("ngramOverlap counts shared distinct n-grams per doc") {
    val rows = Contamination.ngramOverlap(corpus, bench, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(rows === Set(
      (0L, 7L, 3L, Some(math.rint(3.0 / 7.0 * 1e6) / 1e6)),
      (1L, 4L, 0L, Some(0.0)),
      (2L, 4L, 1L, Some(0.25)),
      (3L, 0L, 0L, None)))
  }

  test("benchmark n-grams are deduplicated across benchmark docs") {
    val dupBench = bench.union(Seq((101L, "d e f g h")).toDF("doc_id", "text"))
    val a = Contamination.ngramOverlap(corpus, bench, "doc_id", "text", 3)
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toSet
    val b = Contamination.ngramOverlap(corpus, dupBench, "doc_id", "text", 3)
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toSet
    assert(a === b)
  }
}
