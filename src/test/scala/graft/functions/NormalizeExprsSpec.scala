package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NormalizeExprsSpec extends SparkSpec {
  import spark.implicits._

  private def one(in: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(in).toDF("t").select(c(col("t")).cast("string").as("r")).as[String].head()

  test("nfc composes combining sequences to canonical form") {
    val decomposed = "café" // e + combining acute
    assert(decomposed.length == 5)
    val out = one(decomposed, NormalizeExprs.nfc)
    assert(out == "café")
    assert(out.length == 4)
  }

  test("nfc is idempotent and null-safe") {
    assert(one("café", NormalizeExprs.nfc) == "café")
    val n = Seq[Option[String]](None).toDF("t")
      .select(NormalizeExprs.nfc(col("t")).as("r")).head
    assert(n.isNullAt(0))
  }

  test("stripAccents removes marks from composed AND decomposed input") {
    assert(one("café", NormalizeExprs.stripAccents) == "cafe")
    assert(one("café", NormalizeExprs.stripAccents) == "cafe")
    assert(one("Über straße", NormalizeExprs.stripAccents) == "Uber straße")
  }

  test("charEntropy matches hand-computed values") {
    val df = Seq("aaaa", "abab", "abcd", "").toDF("t")
      .select(col("t"), NormalizeExprs.charEntropy(col("t")).as("e"))
    val m = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("aaaa") == 0.0)
    assert(math.abs(m("abab") - 1.0) < 1e-12)
    assert(math.abs(m("abcd") - 2.0) < 1e-12)
    assert(m("") == 0.0)
  }

  test("charEntropy counts code points, not UTF-16 units") {
    // U+1D11E (musical clef) is a surrogate pair in UTF-16; two of
    // them + two 'a' = two distinct code points, entropy 1 bit
    val s = "a𝄞a𝄞"
    val e = Seq(s).toDF("t")
      .select(NormalizeExprs.charEntropy(col("t"))).as[Double].head()
    assert(math.abs(e - 1.0) < 1e-12)
  }

  test("fixMojibake repairs double-encoded UTF-8 and only that") {
    val mojibake = "cafÃ©"     // UTF-8 é read back as Latin-1
    val genuine = "café"            // real é
    assert(one(mojibake, NormalizeExprs.fixMojibake) == genuine)
    assert(one(genuine, NormalizeExprs.fixMojibake) == genuine)  // untouched
    assert(one("plain ascii", NormalizeExprs.fixMojibake) == "plain ascii")
    // beyond Latin-1 (λ) cannot be a Latin-1 misread: untouched
    assert(one("λ calculus", NormalizeExprs.fixMojibake) == "λ calculus")
    // idempotent: repairing a repaired string changes nothing
    assert(one(one(mojibake, NormalizeExprs.fixMojibake), NormalizeExprs.fixMojibake) == genuine)
  }

  test("normalization expressions stay inside whole-stage codegen") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = d.select(
      NormalizeExprs.nfc(col("text")),
      NormalizeExprs.charEntropy(col("text")))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), s"projection not codegen'd:\n$plan")
    assert(!plan.contains("Exchange"))
  }
}
