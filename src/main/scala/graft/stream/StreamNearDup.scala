package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** [EXT] Streaming NEAR-duplicate gate — the continuous analog of
  * [[graft.ext.Dedup.portableSimHashNearDuplicates]]: admit a
  * document only if no already-admitted document has a SimHash within
  * `maxHamming` of it. [[StreamDedup]] suppresses exact copies; this
  * catches the boilerplate-edited re-crawl (date swapped, one
  * sentence appended) that exact digests miss. No reference
  * equivalent (north-star extension).
  *
  * Design — bucket-local LSH, not global search: per-event global
  * nearest-signature lookup is not expressible as bounded keyed
  * state, so the stream is keyed by the TOP `prefixBits` BITS of the
  * 60-bit signature and each bucket checks only its own members —
  * exactly one shuffle, state sharded across the cluster by bucket.
  * Recall contract (the LSH trade, stated not hidden): a true
  * near-dup pair at Hamming distance d is caught iff none of its d
  * differing bits falls in the prefix — for d ≤ `maxHamming` ≪ 60
  * and a short prefix that is the common case; pairs that straddle
  * buckets pass the gate. Batch [[graft.ext.Dedup]] sweeps remain
  * the exactness backstop, exactly as LSH candidate generation backs
  * the batch pair joins.
  *
  * State: per bucket, the (signature, doc_id) pairs admitted so far,
  * capped at `maxPerBucket` (oldest evicted — a flooded bucket
  * degrades recall, never memory). 16 B per admitted doc, bucket
  * count bounded by 2^prefixBits: total state is a plan constant.
  * Within a micro-batch, documents fold in ascending doc_id order
  * (the [[StreamBudget]] determinism discipline); a rejected doc
  * names the smallest-id stored match as its canonical.
  *
  * The signature is the PORTABLE 60-bit md5 SimHash — bit-for-bit
  * the batch [[graft.ext.Dedup.portableSimHashSignatures]] table
  * (spec-pinned), so stream verdicts are auditable against batch
  * sweeps and re-derivable in any engine with md5.
  */
object StreamNearDup {

  final case class Doc(doc_id: Long, text: String)
  // NOT private: Catalyst's generated code must see the accessors.
  final case class Keyed(doc_id: Long, simhash: Long, bucket: Long)
  final case class BucketState(sigs: Array[Long], ids: Array[Long])
  final case class Verdict(
      doc_id: Long, simhash: Long, bucket: Long,
      admitted: Boolean, matched_id: Long)

  /** Scalar model of the portable 60-bit SimHash — the same
    * tokenization (`split(trim(lower(text)), " ")`, empty tokens
    * INCLUDED — DuckDB str_split parity) and the same md5-prefix
    * votes as the Column form. Locale-independent lowercasing.
    */
  def simHash60(text: String): Long = {
    val toks = text.trim.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    val votes = new Array[Int](60)
    toks.foreach { t =>
      val h = graft.functions.Md5Ops.prefix60(
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var i = 0
      while (i < 60) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var sig = 0L
    var i = 0
    while (i < 60) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  /** `docs` must carry (doc_id, text); emits one verdict per document
    * in append mode (`matched_id` = −1 when admitted).
    */
  def gate(
      docs: DataFrame, prefixBits: Int = 12, maxHamming: Int = 5,
      maxPerBucket: Int = 256): Dataset[Verdict] = {
    require(prefixBits >= 1 && prefixBits <= 59,
      s"prefixBits out of range: $prefixBits")
    require(maxHamming >= 0, s"maxHamming must be >= 0: $maxHamming")
    require(maxPerBucket >= 1, s"maxPerBucket must be >= 1: $maxPerBucket")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr("doc_id", "text").as[Doc]
      .map { d =>
        val s = simHash60(d.text)
        Keyed(d.doc_id, s, s >>> (60 - prefixBits))
      }
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, Verdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Long, it: Iterator[Keyed], state) =>
          // newest-first parallel arrays (constant-size state cap)
          var sigs = state.getOption.map(_.sigs.toList).getOrElse(Nil)
          var ids = state.getOption.map(_.ids.toList).getOrElse(Nil)
          val out = it.toSeq.sortBy(_.doc_id).map { d =>
            val matchIds = sigs.zip(ids).collect {
              case (s, id)
                if java.lang.Long.bitCount(s ^ d.simhash) <= maxHamming => id
            }
            if (matchIds.nonEmpty)
              Verdict(d.doc_id, d.simhash, bucket,
                admitted = false, matched_id = matchIds.min)
            else {
              sigs = (d.simhash :: sigs).take(maxPerBucket)
              ids = (d.doc_id :: ids).take(maxPerBucket)
              Verdict(d.doc_id, d.simhash, bucket,
                admitted = true, matched_id = -1L)
            }
          }
          state.update(BucketState(sigs.toArray, ids.toArray))
          out.iterator
      }
  }
}
