package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** [EXT] Streaming data-quality gate — the dataset-level analog of the
  * reference's per-file quarantine routing ([[Ingest]]): every
  * micro-batch is audited against a declarative constraint suite
  * ([[graft.ops.Quality.rowChecks]]) and COMMITTED or QUARANTINED as a
  * unit, with the audit report itself durably appended. This is the
  * promotion gate a continuous training-data pipeline needs: a bad
  * upstream deploy poisons one batch, not the lake.
  *
  * Scale shape: the audit is one map-side-combinable aggregate pass
  * over the batch (however many predicates are declared), and the
  * routing decision is a driver-side fold over the ≤ |checks|-row
  * report — the batch data itself is never collected. foreachBatch
  * gives exactly-once sink semantics per the checkpoint, the same
  * contract as [[StreamMerge]].
  */
object StreamQuality {

  /** One batch's verdict: batch id, overall pass, and the report rows
    * (check_name, n_rows, n_violations, pass_rate).
    */
  final case class BatchVerdict(
      batchId: Long, pass: Boolean, report: Seq[Row])

  /** Gate `stream` on the constraint suite: a batch where EVERY check's
    * pass_rate is ≥ `minPassRate` goes to `commit`, otherwise whole to
    * `quarantine` (the strict whole-file routing posture, lifted to
    * batches). Each batch's verdict is fed to `onReport` (append it to
    * an audit table, page an operator, ...). Empty batches commit
    * vacuously (no rows, no violations — mirroring the audit's n_rows
    * = 0 ⇒ no check can fail).
    *
    * Returns the started query (caller owns lifecycle).
    */
  def gatedIngest(
      stream: DataFrame,
      checks: Seq[(String, org.apache.spark.sql.Column)],
      minPassRate: Double,
      commit: DataFrame => Unit,
      quarantine: DataFrame => Unit,
      onReport: BatchVerdict => Unit = _ => (),
      checkpointDir: Option[String] = None,
      trigger: Option[Trigger] = None): StreamingQuery = {
    require(minPassRate >= 0.0 && minPassRate <= 1.0,
      s"minPassRate in [0,1]: $minPassRate")
    val writer: DataStreamWriter[Row] = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batch.isEmpty) {
          onReport(BatchVerdict(batchId, pass = true, Seq.empty))
        } else {
          // persist: the batch lineage is evaluated by the audit AND
          // the commit/quarantine write — without the cache each
          // action re-scans/re-decodes the source (Ingest.scala's
          // validated.persist() discipline).
          batch.persist()
          try {
            // One aggregate pass; ≤ |checks| rows reach the driver.
            val report = graft.ops.Quality.rowChecks(batch, checks).collect()
            // Gate on the EXACT counts, not the 6-dp-rounded
            // pass_rate: at >= ~2M rows a single violation rounds to
            // 1.0 and would sail through a strict minPassRate = 1.0
            // gate — the exact comparison makes 1.0 mean "zero
            // violations" at any batch size.
            val pass = report.forall { r =>
              val n = r.getAs[Long]("n_rows")
              val v = r.getAs[Long]("n_violations")
              (n - v).toDouble >= minPassRate * n.toDouble
            }
            if (pass) commit(batch) else quarantine(batch)
            onReport(BatchVerdict(batchId, pass, report.toSeq))
          } finally batch.unpersist()
        }
        ()
      }
    val withCp = checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
    trigger.fold(withCp)(t => withCp.trigger(t)).start()
  }

  /** Lenient variant — the row-level posture ([[Ingest]]'s lenient
    * mode, lifted to batches): VALID rows (violating no check) commit,
    * violating rows quarantine, every batch partially survives. The
    * audit report still covers the whole batch. Use when upstream is
    * known-noisy and dropping a whole batch per stray row would
    * starve the lake; keep [[gatedIngest]] when a violation signals a
    * systemic upstream fault.
    *
    * Scale shape: the split is ONE disjunction predicate evaluated
    * twice (filter + its negation) over the batch — no join, no
    * second audit pass; the report reuses the same aggregate as the
    * strict gate.
    */
  def lenientIngest(
      stream: DataFrame,
      checks: Seq[(String, org.apache.spark.sql.Column)],
      commit: DataFrame => Unit,
      quarantine: DataFrame => Unit,
      onReport: BatchVerdict => Unit = _ => (),
      checkpointDir: Option[String] = None,
      trigger: Option[Trigger] = None): StreamingQuery = {
    require(checks.nonEmpty, "at least one check")
    val violates = checks.map(_._2).reduce(_ || _)
    val writer: DataStreamWriter[Row] = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batch.isEmpty) {
          onReport(BatchVerdict(batchId, pass = true, Seq.empty))
        } else {
          // persist: audit + the two split writes would otherwise
          // re-evaluate the source lineage up to three times.
          batch.persist()
          try {
            val report = graft.ops.Quality.rowChecks(batch, checks).collect()
            val clean = report.forall(_.getAs[Long]("n_violations") == 0L)
            // null-evaluating predicates count as NOT violating (a check
            // that cares about nulls must say isNull explicitly) — the
            // coalesce keeps the split a true partition of the batch.
            val bad = batch.filter(coalesce(violates, lit(false)))
            val good = batch.filter(!coalesce(violates, lit(false)))
            commit(good)
            if (!clean) quarantine(bad)
            onReport(BatchVerdict(batchId, pass = clean, report.toSeq))
          } finally batch.unpersist()
        }
        ()
      }
    val withCp = checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
    trigger.fold(withCp)(t => withCp.trigger(t)).start()
  }
}
