package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(UrlOps.canonicalizeUrl($"u").as("c"))
      .as[String].collect().toSeq

  test("canonicalizeUrl lowercases scheme://host but preserves path case") {
    assert(canon("HTTPS://Example.COM/Some/Path") ==
      Seq("https://example.com/Some/Path"))
  }

  test("canonicalizeUrl drops fragments and trailing slashes") {
    assert(canon(
      "https://a.io/x/#section",
      "https://a.io/x///",
      "https://a.io/x") == Seq.fill(3)("https://a.io/x"))
  }

  test("canonicalizeUrl strips tracking params, keeps and sorts the rest") {
    assert(canon(
      "https://a.io/p?utm_source=tw&b=2&a=1&gclid=zz",
      "https://a.io/p?a=1&fbclid=k&b=2",
      "https://a.io/p?b=2&a=1&ref=feed") == Seq.fill(3)("https://a.io/p?a=1&b=2"))
  }

  test("canonicalizeUrl drops a query that becomes empty") {
    assert(canon("https://a.io/p?utm_campaign=x&utm_medium=y#f") ==
      Seq("https://a.io/p"))
  }

  test("canonicalizeUrl does not confuse ref= with suffix matches like href=") {
    assert(canon("https://a.io/p?href=x&pref=y") ==
      Seq("https://a.io/p?href=x&pref=y"))
  }

  test("canonicalizeUrl leaves bare hosts and relative paths intact") {
    assert(canon("HTTPS://A.IO", "/relative/Path?x=1") ==
      Seq("https://a.io", "/relative/Path?x=1"))
  }

  test("dedupByCanonicalUrl collapses spelling variants to one row") {
    val docs = Seq(
      (1L, "https://a.io/p?b=2&a=1"),
      (2L, "HTTPS://A.IO/p/?a=1&b=2&utm_source=x#frag"),
      (3L, "https://a.io/q")
    ).toDF("doc_id", "url")
    val out = UrlOps.dedupByCanonicalUrl(docs, "doc_id", "url")
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(
      ("https://a.io/p?a=1&b=2", 2L, 1L),
      ("https://a.io/q", 1L, 3L)))
  }

  test("canonicalization is a pure projection: no shuffle before the group-by") {
    val docs = Seq((1L, "https://a.io/p")).toDF("doc_id", "url")
    val plan = UrlOps.dedupByCanonicalUrl(docs, "doc_id", "url")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
