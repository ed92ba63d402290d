package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [EXT] PII redaction for training-data curation: replace emails,
  * IPv4 addresses, SSN-shaped ids, and phone-shaped numbers with
  * typed placeholder tokens. No reference equivalent (north-star
  * extension per BASELINE.json).
  *
  * Patterns are deliberately RE2-compatible (no lookaround, no
  * backreferences): the same regexes run unchanged on any
  * linear-time engine, and `regexp_replace` stays codegen'd — a pure
  * projection, embarrassingly parallel at any scale.
  *
  * Order matters: emails first (an address contains digit runs a
  * later pattern could clip), then IPs (dotted digit runs), then the
  * more-specific SSN shape before the phone shape.
  */
object Redact {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val SsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhonePattern = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** The standard redaction chain. Each stage is one
    * `regexp_replace`; Catalyst collapses the chain into a single
    * projection.
    */
  def redactPii(c: Column): Column = {
    val steps = Seq(
      EmailPattern -> "<EMAIL>",
      Ipv4Pattern -> "<IP>",
      SsnPattern -> "<ID>",
      PhonePattern -> "<PHONE>")
    steps.foldLeft(c) { case (acc, (pat, tok)) =>
      regexp_replace(acc, pat, tok)
    }
  }
}
