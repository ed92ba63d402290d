package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [EXT] Text scrubbing / normalization for training-data curation:
  * mask identifier-like substrings (emails, URLs), collapse whitespace,
  * strip control characters. Pure `regexp_replace` Column chains —
  * codegen'd, one pass per document, no UDFs — so a corpus-wide scrub
  * is a single embarrassingly-parallel projection.
  *
  * Patterns use only character classes, quantifiers and alternation so
  * Java regex (Spark) and RE2 (DuckDB/others) agree — no backrefs, no
  * lookaround (RE2 has neither).
  */
object TextClean {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // stop at ANY whitespace, not just space — [^ ]+ would run across a
  // newline/tab and mask the following non-URL text
  val UrlPattern = "https?://[^ \\t\\r\\n]+"
  val ControlPattern = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"

  /** Replace email addresses with a mask token. */
  def scrubEmails(text: Column, mask: String = "<EMAIL>"): Column =
    regexp_replace(text, EmailPattern, mask)

  /** Replace http(s) URLs with a mask token. */
  def scrubUrls(text: Column, mask: String = "<URL>"): Column =
    regexp_replace(text, UrlPattern, mask)

  /** Replace non-printing control characters (except \t \n \r) with a
    * space — a space, not deletion: control chars usually act as field
    * or line separators, and deleting them would GLUE the neighboring
    * tokens together ("ab" → "ab").
    */
  def stripControl(text: Column): Column =
    regexp_replace(text, ControlPattern, " ")

  /** Collapse runs of whitespace to single spaces and trim. */
  def collapseWhitespace(text: Column): Column =
    trim(regexp_replace(text, "[ \\t\\r\\n]+", " "))

  /** The standard curation scrub: drop control chars FIRST (so a
    * control char right after a URL becomes a boundary the URL mask
    * stops at, instead of being swallowed into the mask along with the
    * following words), then mask PII-ish identifiers, then normalize
    * whitespace — composed as ONE projection.
    */
  def scrub(text: Column): Column =
    collapseWhitespace(scrubUrls(scrubEmails(stripControl(text))))

  /** HTML → text extraction (the boilerplate-strip step of a web-crawl
    * pipeline), as a pure regex projection:
    *   1. drop <script>/<style> elements WITH their contents (code and
    *     CSS are not prose; `(?s)` so the body may span newlines);
    *   2. drop all remaining tags and comments — `<[^>]*>` covers
    *     `<!-- ... -->` too, unless the comment body itself contains
    *     '>' (documented approximation: a regex pass, not an HTML5
    *     parser — crawl-scale extraction accepts that trade);
    *   3. decode the five standard entities + nbsp (amp LAST, so
    *     `&amp;lt;` decodes to the literal `&lt;` and not `<`);
    *   4. collapse whitespace.
    * Tags are replaced by a space — block boundaries must separate
    * words ("<p>a</p><p>b</p>" → "a b", never "ab").
    *
    * RE2-compatible like the rest of this module (lazy quantifiers
    * and `(?s)`/`(?i)` flags are RE2 features; no lookaround).
    */
  def stripHtml(text: Column): Column = {
    val noScript = regexp_replace(text,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noScript, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (e, v)) => regexp_replace(c, e, v) }
    collapseWhitespace(decoded)
  }
}
