package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** [EXT] Streaming per-source token-budget gate — the continuous
  * sibling of [[graft.ext.Sampling.tokenBudgetSelect]]: each source
  * stratum may contribute at most `budget` tokens to the curated
  * output. Admission is GREEDY whole-doc best-effort fill: a document
  * is admitted iff it fits ENTIRELY in the remaining budget; a
  * rejection is per-document, so a later smaller document that still
  * fits IS admitted (spec-pinned). This deliberately differs from the
  * batch operator's maximal-PREFIX rule — a stream cannot know the
  * future ordering a prefix is defined over, and best-effort fill
  * wastes less budget; rejected documents are audited, not silently
  * dropped. The gate a continuously-ingesting pretraining mix uses to
  * stop a crawl source from flooding the corpus between rebalances.
  * No reference equivalent (north-star extension).
  *
  * Engine mapping: `KeyValueGroupedDataset.flatMapGroupsWithState`
  * with per-SOURCE state = one running token count — constant-size
  * per key, so the state store holds |sources| longs no matter how
  * many documents stream through (the [[StreamSession]] bounded-state
  * discipline). Within a micro-batch a source's documents are folded
  * in ascending `doc_id` order, making admission deterministic under
  * in-batch disorder; a document is admitted iff it fits ENTIRELY
  * (the batch operator's whole-doc rule). No timeout: a budget is a
  * lifetime contract, not a window — state never expires.
  *
  * Output (append, one row per document): the admission verdict plus
  * the post-decision running total, so downstream writers filter on
  * `admitted` and auditors get the full trajectory.
  */
object StreamBudget {

  final case class Doc(source: String, doc_id: Long, n_tokens: Long)
  final case class Verdict(
      source: String, doc_id: Long, n_tokens: Long,
      admitted: Boolean, cum_tokens: Long)

  /** `docs` must carry (source, doc_id, n_tokens); emits one verdict
    * per document in append mode.
    */
  def gate(docs: DataFrame, budget: Long): Dataset[Verdict] = {
    require(budget > 0, s"budget must be positive: $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr("source", "doc_id", "n_tokens")
      .as[Doc]
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, Verdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, it: Iterator[Doc], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = it.toSeq.sortBy(_.doc_id).map { d =>
            // A negative token count (upstream corruption) would
            // silently UN-spend lifetime budget; reject it — audited
            // like any rejection, and the invariant cum is monotone.
            val fits = d.n_tokens >= 0 && cum + d.n_tokens <= budget
            if (fits) cum += d.n_tokens
            Verdict(source, d.doc_id, d.n_tokens, fits, cum)
          }
          state.update(cum)
          out.iterator
      }
  }
}
