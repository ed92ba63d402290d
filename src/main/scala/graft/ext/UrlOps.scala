package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] URL canonicalization for web-crawl curation. No reference
  * equivalent (north-star extension per BASELINE.json).
  *
  * Crawled corpora carry the same page under many spellings — case in
  * the host, tracking parameters, fragment anchors, trailing slashes,
  * shuffled query order. Deduplicating by raw URL misses all of them;
  * canonicalize first, then the dedup is a plain hash group-by.
  *
  * The canonical form (documented contract, applied in this order):
  *   1. trim; drop the `#fragment`;
  *   2. lowercase the `scheme://host` head (path and query keep case —
  *     paths are case-sensitive on most origins);
  *   3. strip trailing `/` runs from the path;
  *   4. drop tracking parameters (`utm_*`, `gclid`, `fbclid`, `ref`)
  *     and empty params, then SORT the survivors — query order never
  *     changes response identity for idempotent GETs, and sorting
  *     makes the form order-insensitive.
  * Ports are left as written (`:80` vs bare is origin-dependent
  * enough to leave to the caller).
  *
  * Everything is a pure projection — codegen'd string kernels, no
  * UDF, no shuffle until the caller aggregates — and every step is
  * RE2-compatible (no lookarounds, no replacement backrefs), so the
  * identical pipeline runs in any engine with regex + list lambdas;
  * the DuckDB oracle executes these same steps verbatim.
  */
object UrlOps {

  private val SchemeHost = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*"
  private val Tracking = "^(utm_[a-zA-Z0-9_]+|gclid|fbclid|ref)="

  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(trim(u), "#.*", "")
    val pre = regexp_extract(noFrag, "^([^?]*)", 1)
    val qs = regexp_extract(noFrag, "\\?(.*)$", 1) // "" when absent
    val head = regexp_extract(pre, SchemeHost, 0)
    val path = regexp_replace(pre, SchemeHost, "")
    val cleanPath = regexp_replace(path, "/+$", "")
    val kept = array_sort(filter(split(qs, "&"),
      p => p =!= "" && !p.rlike(Tracking)))
    val query = when(size(kept) > 0,
      concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
    concat(lower(head), cleanPath, query)
  }

  /** Group documents by canonical URL: one row per distinct canonical
    * form with the duplicate count and the smallest member id (the
    * keeper a collapse pass would retain). One hash shuffle on the
    * canonical string; the canonicalization itself rides the scan.
    */
  def dedupByCanonicalUrl(
      df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalizeUrl(col(urlCol)).as("url_canon"))
      .groupBy("url_canon")
      .agg(
        count(lit(1)).as("n_docs"),
        min(col(idCol)).as("first_doc"))
}
