package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [EXT] Text analysis for LLM training-data pipelines: token stats,
  * language-ID heuristic, quality scoring, document fingerprints.
  * No reference equivalent (north-star extension per BASELINE.json).
  *
  * Everything here is pure Column expressions — codegen'd, no UDFs — so
  * a 100 TB `documents` scan stays one embarrassingly-parallel stage
  * with full column pruning (only `text` is read when only stats are
  * selected).
  */
object TextStats {

  /** Small multilingual-ish stopword set used by the language heuristic
    * and the quality score. Deliberately tiny and fixed: the point is a
    * deterministic, cheap signal, not linguistic accuracy.
    */
  val enStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "on", "for",
    "with", "at", "by", "from", "as", "it", "that", "this")

  /** Whitespace tokens of trimmed text (empty text → [""], size 1 — the
    * same contract as DuckDB's `str_split`, which the oracles rely on).
    */
  def tokens(text: Column): Column = split(trim(text), " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def uniqueTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * other non-space chars — a cheap stand-in for a real tokenizer's
    * token count.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Fraction of tokens that are English stopwords ∈ [0,1]. Exact
    * integer-ratio division — deterministic across engines.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String] = enStopwords): Column = {
    val stops = filter(tokens(text), t => t.isin(stopwords: _*))
    size(stops).cast("double") / tokenCount(text).cast("double")
  }

  /** N-gram-heuristic language ID: stopword density decides between 'en'
    * and 'unk'. A real system would score several languages' stopword
    * sets; the shape (per-language density → argmax) is the same.
    */
  def langId(text: Column, threshold: Double = 0.05): Column =
    when(stopwordRatio(text) >= threshold, lit("en")).otherwise(lit("unk"))

  /** Quality score ∈ [0,1]: length saturation + stopword naturalness.
    * Components and weights are fixed so the score is reproducible.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(lit(1.0), tokenCount(text).cast("double") / 100.0)
    round(lenScore * 0.7 + stopwordRatio(text) * 0.3, 6)
  }

  /** Exact content fingerprint (md5 of utf-8 bytes). */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Normalized fingerprint: md5 over the sorted distinct lowercase
    * token set — equal for token-permuted / duplicated-token documents
    * (bag-of-words canonical form).
    */
  def normalizedFingerprint(text: Column): Column =
    md5(array_join(
      array_sort(array_distinct(split(lower(trim(text)), " "))), " ")
      .cast("binary"))
}
