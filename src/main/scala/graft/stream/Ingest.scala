package graft.stream

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.config.PipelineConf
import graft.ops.{Aggregate, Cleanse, Validate}
import graft.schema.Schemas
import graft.sink.{BatchSink, FsRouting}

/** S2/S3/S5 + T1-T5: the reference's directory-watch ETL loop
  * (`pipeline.py:273-431`) as Structured Streaming.
  *
  * Mapping:
  *   - watchdog events + 5 s poll + initial scan → checkpointed file
  *     source with `Trigger.ProcessingTime` (subsumes all three paths,
  *     `pipeline.py:373-431`);
  *   - `recently_processed` dedup set + temp-name skip → the source's
  *     exactly-once file log + `pathGlobFilter=*.csv`
  *     (`pipeline.py:362-372`);
  *   - per-file strict validate → quarantine-or-commit
  *     (`pipeline.py:308-324`) → one `foreachBatch` that groups by
  *     `input_file_name()` and routes each file atomically;
  *   - DB failure leaves the file in `data/` for the next scan
  *     (`pipeline.py:326-328`) → sink returns false ⇒ no move; the
  *     replayed write is idempotent (delete-by-file / upsert).
  *
  * Scale note: the per-file commit loop is the reference's contract
  * (file = transaction). Throughput at scale comes from file-level
  * parallelism upstream (many files per batch are validated in one
  * distributed pass; only the commit/move tail is per-file).
  */
object Ingest {

  final case class FileOutcome(
      file: String, status: String, reason: Option[String], rows: Long)

  /** One micro-batch: validate every file's rows in a single distributed
    * pass, then route file-by-file. Returns per-file outcomes (for logs
    * and tests).
    */
  def processBatch(
      conf: PipelineConf, sink: BatchSink, batch: DataFrame): Seq[FileOutcome] = {
    val outcomes = scala.collection.mutable.ArrayBuffer.empty[FileOutcome]

    // V6: per-file header check (reference `pipeline.py:100-105`) — with
    // an explicit schema Spark's CSV reader matches columns by POSITION
    // and ignores header names, so a malformed header must be caught
    // here or bad data flows through silently.
    val headerBad: Map[String, String] = batch
      .select("__file").distinct().collect().map(_.getString(0))
      .flatMap { uri =>
        val path = FsRouting.toLocalPath(uri)
        missingHeaderColumns(path) match {
          case Nil => None
          case missing => Some(uri ->
            (s"Missing critical columns: ${missing.mkString(", ")}. " +
              "Quarantining."))
        }
      }.toMap
    val batchOk =
      if (headerBad.isEmpty) batch
      else batch.filter(!col("__file").isin(headerBad.keys.toSeq: _*))

    if (!batchOk.isEmpty) {
      // NA normalization (S1) then per-file line numbers: the window is
      // partitioned per file — parallelism = files per batch, matching
      // the reference's unit of work.
      // __mono must be added HERE: inside foreachBatch the frame is a
      // plain batch DF (monotonically_increasing_id is rejected on
      // streaming plans).
      val cleaned = Schemas.sensorColumns.foldLeft(
        batchOk.withColumn("__mono", monotonically_increasing_id()))((d, c) =>
        d.withColumn(c, Cleanse.naNormalize(col(c))))
      val w = Window.partitionBy(col("__file"))
        .orderBy(col("__mono"))
      val numbered = cleaned
        .withColumn("row_num", row_number().over(w).cast("long"))
      val validated = Validate.withValidation(numbered, conf, "row_num")
        .persist()
      try {
        val verdicts = Validate.strictVerdicts(validated, "__file")
          .collect() // one row per file — driver-side routing decisions

        verdicts.foreach { v =>
          val fileUri = v.getAs[String]("__file")
          val path = FsRouting.toLocalPath(fileUri)
          val name = path.getFileName.toString
          val nRows = v.getAs[Long]("n_rows")
          if (!v.getAs[Boolean]("is_clean")) {
            val reason = Option(v.getAs[String]("first_error"))
              .getOrElse("Validation failed.")
            FsRouting.quarantine(path, Paths.get(conf.quarantineDir), reason)
            outcomes += FileOutcome(name, "quarantined", Some(reason), nRows)
          } else {
            val fileRows = validated.filter(col("__file") === fileUri)
            val typed = Cleanse.castTyped(
              fileRows.select(Schemas.sensorColumns.map(col): _*))
            val agg = Aggregate.metricAggregates(
              typed, Seq("sensor_id"), Schemas.metricColumns, "timestamp")
            if (sink.write(name, typed, agg)) {
              FsRouting.markProcessed(path, Paths.get(conf.processedDir))
              outcomes += FileOutcome(name, "processed", None, nRows)
            } else {
              // retained in data/ for retry next batch (T5)
              outcomes += FileOutcome(name, "retained", Some("sink failure"), nRows)
            }
          }
        }
      } finally validated.unpersist()
    }

    // Physical moves of bad-header files happen LAST: the batch frame
    // may still lazily re-read the underlying CSVs until every Spark
    // action above has completed.
    headerBad.foreach { case (uri, reason) =>
      val path = FsRouting.toLocalPath(uri)
      FsRouting.quarantine(path, Paths.get(conf.quarantineDir), reason)
      outcomes += FileOutcome(path.getFileName.toString, "quarantined",
        Some(reason), 0L)
    }
    outcomes ++= sweepEmptyFiles(conf)
    outcomes.toSeq
  }

  /** S5: header-only/zero-line files produce no rows, so they never
    * appear in a micro-batch — sweep them from `data/` directly
    * (reference: `pipeline.py:287-296`, reason `quarantine_log.txt:1`).
    */
  def sweepEmptyFiles(conf: PipelineConf): Seq[FileOutcome] = {
    val dir = Paths.get(conf.dataDir)
    if (!Files.isDirectory(dir)) return Seq.empty
    Files.list(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".csv"))
      .filter(p => countDataLines(p) == 0)
      .map { p =>
        FsRouting.quarantine(p, Paths.get(conf.quarantineDir),
          FsRouting.EmptyFileReason)
        FileOutcome(p.getFileName.toString, "quarantined",
          Some(FsRouting.EmptyFileReason), 0L)
      }.toSeq
  }

  /** Required columns absent from the file's header line (V6). */
  private def missingHeaderColumns(p: Path): Seq[String] =
    try {
      val s = Files.lines(p)
      val header = try s.findFirst().orElse("") finally s.close()
      val present = header.split(",").map(_.trim.toLowerCase).toSet
      Schemas.sensorColumns.filterNot(present.contains)
    } catch { case _: Exception => Nil } // moved/unreadable ⇒ let validation decide

  private def countDataLines(p: Path): Long =
    try {
      val s = Files.lines(p)
      try s.skip(1).filter(l => l.trim.nonEmpty).count()
      finally s.close()
    } catch { case _: Exception => Long.MaxValue } // unreadable ⇒ don't sweep

  /** Start the streaming query (T1: 5 s trigger; T2: initial backlog is
    * the file source's first batch; T3: checkpointed exactly-once).
    */
  def start(spark: SparkSession, conf: PipelineConf, sink: BatchSink): StreamingQuery = {
    val raw = spark.readStream
      .option("header", "true")
      .option("pathGlobFilter", "*.csv")
      .schema(Schemas.sensorCsvRaw)
      .csv(conf.dataDir)
      .withColumn("__file", input_file_name())
    raw.writeStream
      .queryName("graft-ingest")
      .trigger(Trigger.ProcessingTime(s"${conf.monitorIntervalSec} seconds"))
      .option("checkpointLocation", conf.checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(conf, sink, batch); ()
      }
      .start()
  }
}
