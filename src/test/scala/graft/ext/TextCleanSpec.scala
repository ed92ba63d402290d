package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextCleanSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(TextClean.scrub(col("t"))).as[String].head()

  test("emails and urls are masked") {
    assert(scrubOne("contact me at jane.doe+spam@ex-ample.org today") ===
      "contact me at <EMAIL> today")
    assert(scrubOne("see https://example.com/a?b=c and http://x.io") ===
      "see <URL> and <URL>")
  }

  test("url match stops at any whitespace, not just space") {
    // regression: [^ ]+ ran across the newline and destroyed "The"
    assert(scrubOne("read https://x.io\nThe secret plan") ===
      "read <URL> The secret plan")
    assert(scrubOne("link http://a.b\tnext") === "link <URL> next")
  }

  test("control chars become boundaries, whitespace collapsed, ends trimmed") {
    // control char -> space (not deletion: deletion would glue tokens)
    assert(scrubOne("a\u0007bc") === "a bc")
    assert(scrubOne("  too   many\t\tspaces \n and lines  ") ===
      "too many spaces and lines")
  }

  test("control char right after a url is a mask boundary, not swallowed") {
    // regression: masking before control-stripping swallowed the word
    // after the control char into the <URL> mask
    assert(scrubOne("see http://x.io\u000bimportant secret") ===
      "see <URL> important secret")
  }

  test("clean text is unchanged") {
    val s = "already clean single spaced text"
    assert(scrubOne(s) === s)
  }

  private def stripOne(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextClean.stripHtml(col("t"))).as[String].head()

  test("stripHtml drops tags but keeps word boundaries between blocks") {
    assert(stripOne("<p>alpha</p><p>beta</p>") === "alpha beta")
    assert(stripOne("<div class=\"x\">one <b>two</b> three</div>") ===
      "one two three")
  }

  test("stripHtml removes script and style elements with their contents") {
    assert(stripOne(
      "before<script type=\"t\">var x = '<p>';\nalert(1)</script>after") ===
      "before after")
    assert(stripOne("<style>p { color: red; }</style>visible") === "visible")
    // case-insensitive tag match
    assert(stripOne("<SCRIPT>junk</SCRIPT>kept") === "kept")
  }

  test("stripHtml drops comments and decodes standard entities") {
    assert(stripOne("a<!-- hidden note -->b") === "a b")
    assert(stripOne("x &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp; y") ===
      "x <tag> \"q\" 's' y")
    // &amp; decodes LAST: double-encoded &amp;lt; yields literal &lt;
    assert(stripOne("a &amp; b &amp;lt; c") === "a & b &lt; c")
  }
}
