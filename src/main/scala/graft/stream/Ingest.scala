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
  *     (`pipeline.py:326-328`) → sink returns false ⇒ no move, AND
  *     the file is recorded in a durable retry ledger
  *     (`<checkpoint>/graft-retry/`): the checkpointed file source
  *     NEVER re-emits a seen path (its dedup is binding where the
  *     reference's is advisory), so without the ledger a retained
  *     file would be retained forever. Pending entries are re-driven
  *     through the same validate→commit path at query start and at
  *     every subsequent data-bearing trigger; the replayed write is
  *     idempotent (delete-by-file / upsert), and a still-failing sink
  *     keeps the entry for the next attempt.
  *
  * Scale note: validation is one distributed pass over the whole
  * micro-batch, and the commit is ONE group write for every clean file
  * (`BatchSink.writeAll` — per-file idempotence preserved through the
  * `file_name` partition/lineage column, per-file transactions kept by
  * the JDBC dialect where the txn boundary IS the reference's K3
  * contract). Only the quarantine/move tail is per-file, bounded by
  * `maxFilesPerTrigger`.
  */
object Ingest {

  /** K8: structured per-stage run log. Message shapes mirror the
    * reference's (`pipeline.py:94,163-168,312-328`, lenient variant
    * evidenced in `logs/pipeline.log`), with file context on every line,
    * so an operator debugging a quarantine storm sees the same story.
    */
  private val log = org.slf4j.LoggerFactory.getLogger("graft.stream.Ingest")

  /** Wall-clock nanos spent in the deferred per-file move loop since
    * the last reset. The move loop is the one O(files) DRIVER-side
    * tail in an otherwise distributed batch (every filesystem rename
    * runs sequentially on the stream thread), so its share of a deep
    * small-file backlog is the number that decides whether the loop
    * ever needs to move off the driver. `IngestBench` resets this
    * before its timed run and reports `move_sec`/`move_share`.
    *
    * SCOPE: process-wide instrumentation, summed across EVERY Ingest
    * stream in the JVM — a reader measuring one stream must ensure it
    * is the only one running (IngestBench is), or the share
    * misattributes other streams' renames. Kept a plain JVM-global on
    * purpose: threading a per-stream meter through the batch path
    * would put bench-only plumbing in every library signature.
    */
  val moveLoopNanos = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Per-file routing outcome, reported to `onBatch` observers.
    *
    * Outcomes are AT-LEAST-ONCE per file across triggers: a terminal
    * `processed`/`quarantined` is emitted at decision time, and if the
    * deferred physical move then fails, a correcting
    * `move_deferred_failed` outcome follows in the same batch and the
    * file re-emits a fresh outcome when the retry pass re-drives it.
    * Consumers needing exactly-once must key on (file, status) of the
    * LAST outcome seen.
    */
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
    // and ignores header names, so the header must be classified here
    // or bad data flows through silently. Four classes:
    //   canonical  — exactly the expected columns in order: the
    //                positional batch read is already correct;
    //   remappable — all required columns present but reordered or
    //                with extras: the POSITIONAL read has the wrong
    //                values under the wrong names (the reference's
    //                pandas maps by NAME and accepts these), so the
    //                file is re-read by name and processed alone;
    //   bad        — required columns missing, header quoting
    //                malformed (tokens Spark's parser would not
    //                reproduce), or the file too large for the
    //                single-split line-numbering contract: quarantine.
    val fileTokens: Map[String, Option[Either[String, Seq[String]]]] = batch
      .select("__file").distinct().collect().map(_.getString(0))
      .map(uri => uri -> headerTokens(FsRouting.toLocalPath(uri))).toMap
    // Line-number contract guard: `__mono` (monotonically_increasing_id)
    // follows CSV line order only while a file maps to ONE input split.
    // Spark cuts a file into splits of `FilePartition.maxSplitBytes` =
    // min(maxPartitionBytes, max(openCostInBytes, bytesPerCore)) — NOT
    // plain maxPartitionBytes: a small batch shrinks bytesPerCore so the
    // effective split size can drop to openCostInBytes (4 MiB default),
    // splitting files well under the conf. Compute the same formula over
    // this batch's files so the guard quarantines exactly the files
    // Spark would split. Size 0 on a stat failure ⇒ not oversize; the
    // unreadable/moved path below decides.
    val sizes: Map[String, Long] = fileTokens.keys.map { uri =>
      uri -> (try Files.size(FsRouting.toLocalPath(uri))
      catch { case _: Exception => 0L })
    }.toMap
    val splitLimit = effectiveMaxSplitBytes(batch.sparkSession, sizes.values)
    val oversize: Map[String, String] = sizes.flatMap { case (uri, sz) =>
      if (sz > splitLimit)
        Some(uri -> (s"File is $sz bytes, larger than the effective " +
          s"input split size ($splitLimit = min(spark.sql.files." +
          "maxPartitionBytes, max(openCostInBytes, bytesPerCore))): " +
          "per-file line numbering requires a single input split. " +
          "Raise spark.sql.files.maxPartitionBytes (and openCostInBytes " +
          "for small batches) to ingest files this large. Quarantining."))
      else None
    }
    val headerBad: Map[String, String] = fileTokens.flatMap {
      case (uri, _) if oversize.contains(uri) => Some(uri -> oversize(uri))
      case (uri, Some(Left(reason))) => Some(uri -> reason)
      case (uri, Some(Right(tokens))) =>
        val missing = Schemas.sensorColumns.filterNot(tokens.toSet)
        if (missing.isEmpty) None
        else Some(uri ->
          (s"Missing critical columns: ${missing.mkString(", ")}. " +
            "Quarantining."))
      case _ => None // unreadable/moved ⇒ let validation decide
    }
    val remappable: Seq[String] = fileTokens.collect {
      case (uri, Some(Right(tokens)))
        if !headerBad.contains(uri) && tokens != Schemas.sensorColumns =>
        uri
    }.toSeq
    val excluded = headerBad.keys.toSeq ++ remappable
    val batchOk =
      if (excluded.isEmpty) batch
      else batch.filter(!col("__file").isin(excluded: _*))

    // Physical moves out of data/ are DEFERRED to the end of the
    // batch (None = processed/, Some(reason) = quarantine): any Spark
    // action below may still fail (executor loss, transient FS) and
    // abort the batch for checkpoint replay — and the replayed batch
    // re-reads every listed file, so one already moved would fail the
    // replay's own scan forever. Sinks are per-file idempotent
    // (partition overwrite / delete-then-insert keyed on file_name),
    // so re-committing an already-committed file on replay is safe.
    val pendingMoves =
      scala.collection.mutable.ArrayBuffer.empty[(Path, Option[String])]
    processValidated(conf, sink, batchOk, outcomes, pendingMoves)

    // Bad-header files quarantine through the same deferred-move
    // buffer (their outcomes/logs at decision time, the move LAST).
    headerBad.foreach { case (uri, reason) =>
      val path = FsRouting.toLocalPath(uri)
      log.error(s"File '${path.getFileName}': $reason")
      pendingMoves += path -> Some(reason)
      outcomes += FileOutcome(path.getFileName.toString, "quarantined",
        Some(reason), 0L)
    }

    // Remappable files: re-read by NAME (header row, all-string — the
    // same string-first contract as the schema'd read) and run each
    // through the identical validate→route path.
    remappable.foreach { uri =>
      val path = FsRouting.toLocalPath(uri)
      log.info(s"File '${path.getFileName}': header reordered/extended — " +
        "re-reading by column name.")
      // Guarded: a header whose quote-aware parse disagrees with the
      // classification split (or with duplicate names) would throw out
      // of foreachBatch, kill the stream, and checkpoint-replay the
      // same batch forever. One malformed file must cost one
      // quarantine, not the pipeline. The try covers ONLY the
      // structural re-read/mapping — a downstream processValidated
      // failure (transient sink/FS fault on a VALID file) must keep
      // the checkpoint-replay retry semantics, not quarantine data.
      // The physical quarantine is only RECORDED here: a later file's
      // transient failure aborts this batch for replay, and a replay
      // re-lists every file — one already moved out of data/ would
      // fail the batch's own actions forever (the moves-LAST
      // invariant below).
      val mapped: Option[DataFrame] =
        try {
          val spark = batch.sparkSession
          val byName = spark.read.option("header", "true").csv(path.toString)
          val actual = byName.columns.map(c => normToken(c) -> c).toMap
          val missing = Schemas.sensorColumns.filterNot(actual.contains)
          if (missing.nonEmpty)
            throw new IllegalStateException(
              s"columns missing on by-name re-read: ${missing.mkString(", ")}")
          Some(byName
            .select(
              Schemas.sensorColumns.map(c => byName.col(actual(c)).as(c)): _*)
            .withColumn("__file", lit(uri)))
        } catch {
          case scala.util.control.NonFatal(e) =>
            val msg = Option(e.getMessage).getOrElse("")
              .linesIterator.nextOption().filter(_.nonEmpty)
              .getOrElse(e.toString.linesIterator.nextOption()
                .getOrElse(e.getClass.getName))
            val reason = s"Header remap failed: $msg. Quarantining."
            log.error(s"File '${path.getFileName}': $reason")
            pendingMoves += path -> Some(reason)
            outcomes += FileOutcome(path.getFileName.toString, "quarantined",
              Some(reason), 0L)
            None
        }
      mapped.foreach(processValidated(conf, sink, _, outcomes, pendingMoves))
    }

    // All batch actions are done — execute the deferred moves. Each
    // move is individually guarded: a fault mid-loop (quarantine dir
    // unwritable, file yanked by an operator) must not abort the batch
    // AFTER earlier moves ran — the replay could no longer read the
    // moved files. The failed move is ledgered instead: the retry pass
    // re-drives the file (sinks are per-file idempotent) and re-decides
    // its routing; a file no longer in data/ prunes as a stale marker.
    val moveT0 = System.nanoTime()
    pendingMoves.foreach { case (path, kind) =>
      try kind match {
        case None =>
          FsRouting.markProcessed(path, Paths.get(conf.processedDir))
        case Some(reason) =>
          FsRouting.quarantine(path, Paths.get(conf.quarantineDir), reason)
          log.warn(s"File '${path.getFileName}' moved to quarantine. " +
            s"Reason: $reason")
      } catch {
        case scala.util.control.NonFatal(e) =>
          log.error(s"Deferred move of '${path.getFileName}' failed " +
            s"(${e.getMessage}); ledgering for retry.")
          recordRetry(conf, path.getFileName.toString)
          // Correct the already-emitted terminal outcome: the file is
          // still in data/ and WILL re-emit when the retry re-drives it
          // (see FileOutcome's at-least-once contract).
          outcomes += FileOutcome(path.getFileName.toString,
            "move_deferred_failed", Some(Option(e.getMessage)
              .getOrElse(e.getClass.getName)), 0L)
      }
    }
    moveLoopNanos.addAndGet(System.nanoTime() - moveT0)
    outcomes.toSeq
  }

  /** The shared validate→route core over a header-clean batch frame
    * (positional or name-remapped — both arrive in canonical column
    * order with string-first types).
    */
  private def processValidated(
      conf: PipelineConf, sink: BatchSink, batchOk: DataFrame,
      outcomes: scala.collection.mutable.ArrayBuffer[FileOutcome],
      pendingMoves: scala.collection.mutable.ArrayBuffer[(Path, Option[String])])
      : Unit = {
    if (!batchOk.isEmpty) {
      // NA normalization (S1) then per-file line numbers: the window is
      // partitioned per file — parallelism = files per batch, matching
      // the reference's unit of work.
      // __mono must be added HERE: inside foreachBatch the frame is a
      // plain batch DF (monotonically_increasing_id is rejected on
      // streaming plans).
      // Line-number ordering contract: __mono follows (partitionId,
      // offset), which matches CSV line order only while each file maps
      // to a SINGLE input split. Guarded upstream (processBatch
      // pre-quarantines files larger than the batch's effective split
      // size) and VERIFIED from the data below: the per-file __mono
      // contiguity check quarantines any file whose rows actually
      // arrived across input splits — which also covers the by-name
      // re-read path, whose SOLO scan computes its own (smaller)
      // split size the batch-wide pre-guard cannot see.
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
        // Single-split contract verified by OBSERVATION, not only
        // predicted by formula: monotonically_increasing_id packs the
        // partition id into the high 33 bits, so a file read as one
        // split has CONTIGUOUS ids (two splits of one file land in
        // different partitions, whose id islands sit ≥2^33 apart and
        // can never abut). Non-contiguity ⇒ row_number over __mono
        // would misnumber lines — quarantine with an actionable
        // reason. One extra bounded aggregate (3 longs per file).
        val splitFiles: Map[String, String] = validated
          .groupBy(col("__file"))
          .agg(count(lit(1)).as("__n"),
            min(col("__mono")).as("__lo"), max(col("__mono")).as("__hi"))
          .collect()
          .flatMap { r =>
            val n = r.getAs[Long]("__n")
            val span = r.getAs[Long]("__hi") - r.getAs[Long]("__lo") + 1
            if (span != n)
              Some(r.getAs[String]("__file") ->
                ("File rows arrived across multiple input splits " +
                  s"(id span $span over $n rows): per-file line " +
                  "numbering requires a single input split. Raise " +
                  "spark.sql.files.maxPartitionBytes (and " +
                  "openCostInBytes for small batches) to ingest files " +
                  "this large. Quarantining."))
            else None
          }.toMap

        val verdicts = Validate.strictVerdicts(validated, "__file")
          .collect() // one row per file — driver-side routing decisions

        // Routing decisions stay per-file (quarantine, logs, outcomes);
        // the committable files then GROUP-COMMIT in one sink pass
        // below, instead of one driver-serialized Spark job pair per
        // file — the difference between O(files) and O(1) job
        // submissions per micro-batch at production file counts.
        final case class Committable(
            uri: String, name: String, path: Path, rows: Long, dropped: Long)
        val toCommit = scala.collection.mutable.ArrayBuffer.empty[Committable]

        verdicts.foreach { v =>
          val fileUri = v.getAs[String]("__file")
          val path = FsRouting.toLocalPath(fileUri)
          val name = path.getFileName.toString
          val nRows = v.getAs[Long]("n_rows")
          val nInvalid = v.getAs[Long]("n_invalid")
          val isClean = v.getAs[Boolean]("is_clean")
          val firstError = Option(v.getAs[String]("first_error"))

          if (splitFiles.contains(fileUri)) {
            val reason = splitFiles(fileUri)
            log.warn(s"File '$name': $reason")
            pendingMoves += path -> Some(reason)
            outcomes += FileOutcome(name, "quarantined", Some(reason), nRows)
          } else if (conf.strictMode) {
            // Past tense: the validation pass already ran (the verdict
            // aggregate above IS the validation); a "Starting…" line
            // here would misstate the execution order.
            log.info(s"File '$name': STRICT validation checked $nRows rows.")
            if (!isClean) {
              val reason = firstError.getOrElse("Validation failed.")
              log.warn(s"Strict validation failed for '$name'. " +
                s"Quarantining. Summary: $reason")
              pendingMoves += path -> Some(reason)
              outcomes += FileOutcome(name, "quarantined", Some(reason), nRows)
            } else {
              log.info(s"File '$name': All $nRows rows passed strict validation.")
              toCommit += Committable(fileUri, name, path, nRows, 0L)
            }
          } else {
            // Lenient: drop bad rows with a logged summary, commit the
            // valid subset (reference log evidence: "Validation
            // complete. 19 valid rows out of 20." then store + move).
            val nValid = nRows - nInvalid
            log.info(s"File '$name': Validation complete. " +
              s"$nValid valid rows out of $nRows.")
            firstError.foreach(e =>
              log.warn(s"File '$name': Summary of row-level issues: $e"))
            if (nValid == 0) {
              // A file with NOTHING valid is garbage, not a partial:
              // committing an empty write and marking it processed
              // would silently discard 100% of its content. Quarantine
              // it like strict mode does.
              val reason = firstError.getOrElse("No valid rows.")
              pendingMoves += path -> Some(reason)
              outcomes += FileOutcome(name, "quarantined", Some(reason), nRows)
            } else {
              toCommit += Committable(fileUri, name, path, nValid, nInvalid)
            }
          }
        }

        if (toCommit.nonEmpty) {
          // ONE typed frame + ONE long-format aggregate for ALL
          // committable files. `is_valid` filters nothing in strict
          // mode (a clean file has no invalid rows) and selects the
          // lenient subset otherwise. file_name comes from a bounded
          // driver map (≤ files-per-trigger entries) rather than URI
          // string surgery, so URL-encoded names stay byte-identical
          // to the quarantine/ledger side.
          val nameByUri =
            typedLit(toCommit.map(c => c.uri -> c.name).toMap)
          val committableRows = validated
            .filter(col("__file").isin(toCommit.map(_.uri).toSeq: _*) &&
              col("is_valid"))
            .withColumn("file_name", element_at(nameByUri, col("__file")))
          val typedAll = Cleanse.castTyped(committableRows
            .select((Schemas.sensorColumns :+ "file_name").map(col): _*))
          val aggAll = Aggregate.metricAggregates(
            typedAll, Seq("file_name", "sensor_id"),
            Schemas.metricColumns, "timestamp")
          val failed = sink.writeAll(toCommit.map(_.name).toSeq,
            typedAll, aggAll)
          toCommit.foreach { c =>
            if (!failed.contains(c.name)) {
              pendingMoves += c.path -> None
              log.info(
                s"Successfully stored data from '${c.name}'. Moving to processed.")
              outcomes += FileOutcome(c.name, "processed",
                if (c.dropped > 0) Some(s"${c.dropped} invalid rows dropped")
                else None, c.rows)
            } else {
              // retained in data/ AND recorded in the retry ledger
              // (T5): the checkpointed source will never re-emit this
              // path, so the ledger is what actually drives the retry
              // (at query start and at each later trigger). Report the
              // ATTEMPTED row count — in lenient mode that is the
              // valid subset, not the whole file.
              recordRetry(conf, c.name)
              log.error(s"Failed to store data for '${c.name}' in DB. " +
                "File remains in data folder for retry.")
              outcomes += FileOutcome(c.name, "retained",
                Some("sink failure"), c.rows)
            }
          }
        }
      } finally validated.unpersist()
    }
  }

  /** S5: header-only/zero-line files produce no rows, so they never
    * appear in a micro-batch — sweep them from `data/` directly
    * (reference: `pipeline.py:287-296`, reason `quarantine_log.txt:1`).
    */
  def sweepEmptyFiles(conf: PipelineConf): Seq[FileOutcome] = {
    val dir = Paths.get(conf.dataDir)
    if (!Files.isDirectory(dir)) return Seq.empty
    // Files.list holds a directory fd until closed; this runs every
    // micro-batch of a long-lived query, so leaking it would exhaust the
    // process fd limit. toSeq materializes before the finally closes.
    val listing = Files.list(dir)
    try {
      listing.iterator().asScala
        .filter(p => p.toString.endsWith(".csv"))
        .filter(p => countDataLines(p) == 0)
        .flatMap { p =>
          // Guarded like the deferred-move loop: the sweep runs AFTER
          // processBatch has executed its physical moves, so a throw
          // here (quarantine dir unwritable, file yanked mid-sweep)
          // would abort a trigger whose files already left data/ and
          // strand the checkpoint replay on missing files. A failed
          // sweep just leaves the file for the next trigger's sweep.
          try {
            log.warn(s"File '${p.getFileName}' is empty. Quarantining.")
            FsRouting.quarantine(p, Paths.get(conf.quarantineDir),
              FsRouting.EmptyFileReason)
            Some(FileOutcome(p.getFileName.toString, "quarantined",
              Some(FsRouting.EmptyFileReason), 0L))
          } catch {
            case scala.util.control.NonFatal(e) =>
              log.error(s"Empty-file sweep of '${p.getFileName}' failed " +
                s"(${e.getMessage}); retrying next trigger.")
              None
          }
        }.toSeq
    } finally listing.close()
  }

  /** T5 retry ledger: one empty marker per sink-failed file, named
    * after it, under `<checkpoint>/graft-retry/`. Durable across
    * restarts (it lives with the checkpoint), bounded by the number
    * of currently-failing files, and idempotent to re-record.
    */
  private def retryLedger(conf: PipelineConf): Path =
    Paths.get(conf.checkpointDir, "graft-retry")

  private def recordRetry(conf: PipelineConf, fileName: String): Unit = {
    val dir = Files.createDirectories(retryLedger(conf))
    val marker = dir.resolve(fileName)
    if (!Files.exists(marker)) Files.createFile(marker)
  }

  /** Re-drive every ledgered file that still sits in `data/` through
    * the SAME validate→route path (a direct batch read of just those
    * files — the streaming source cannot re-emit them). An entry is
    * cleared when its file leaves `data/` (committed+moved,
    * quarantined, or externally removed); a still-failing sink keeps
    * it for the next attempt.
    *
    * `exclude` defers markers whose files the CURRENT micro-batch also
    * lists: on a checkpoint replay the ledgered file is about to be
    * re-driven by processBatch itself — re-driving it here first could
    * commit + move it out from under the replayed batch's own scan
    * (and double-drives it when the sink is still failing). Deferred
    * markers simply wait for the next trigger.
    */
  def retryPending(
      spark: SparkSession, conf: PipelineConf, sink: BatchSink,
      exclude: Set[String] = Set.empty): Seq[FileOutcome] = {
    val dir = retryLedger(conf)
    if (!Files.isDirectory(dir)) return Seq.empty
    val listing = Files.list(dir)
    val markers =
      try listing.iterator().asScala.toSeq
      finally listing.close()
    val (stale, keep) = markers.partition(m =>
      !Files.exists(Paths.get(conf.dataDir).resolve(m.getFileName)))
    stale.foreach(Files.deleteIfExists(_))
    val live = keep.filterNot(m => exclude.contains(m.getFileName.toString))
    if (live.isEmpty) return Seq.empty
    val files = live.map(m =>
      Paths.get(conf.dataDir).resolve(m.getFileName).toString)
    log.info(s"Retrying ${files.size} retained file(s) from the ledger.")
    val batch = spark.read
      .option("header", "true")
      // A listed-then-moved file (operator action between the exists()
      // check above and the scan) must skip, not kill the retry pass.
      .option("ignoreMissingFiles", "true")
      .schema(Schemas.sensorCsvRaw)
      .csv(files: _*)
      .withColumn("__file", input_file_name())
    val outcomes = processBatch(conf, sink, batch)
    live.foreach { m =>
      if (!Files.exists(Paths.get(conf.dataDir).resolve(m.getFileName)))
        Files.deleteIfExists(m)
    }
    outcomes
  }

  /** Header-token normalization: strip a UTF-8 BOM and surrounding
    * RFC-4180 quotes before comparing — '"timestamp"' and a
    * BOM-prefixed first column are valid CSV the reference's pandas
    * accepts, and comparing them raw spuriously quarantined whole
    * valid files.
    */
  private def normToken(s: String): String =
    s.stripPrefix("\uFEFF").trim
      .stripPrefix("\"").stripSuffix("\"").trim.toLowerCase

  /** The file's normalized header tokens (Right), a quarantine reason
    * when the header's quoting is malformed (Left), or None when the
    * file is unreadable/moved (⇒ let validation decide). V6.
    */
  private def headerTokens(p: Path): Option[Either[String, Seq[String]]] =
    try {
      val s = Files.lines(p)
      val header = try s.findFirst().orElse("") finally s.close()
      Some(splitCsvLine(header) match {
        case Some(tokens) => Right(tokens.map(normToken))
        case None => Left("Malformed header quoting. Quarantining.")
      })
    } catch { case _: Exception => None }

  /** Minimal RFC-4180 field split for ONE line: commas inside quoted
    * fields don't separate, doubled quotes unescape. A raw
    * `split(",")` fragments a legitimately quoted header name
    * containing a comma, misclassifying the whole file (spurious
    * remap, or quarantine when a required name sits inside the quoted
    * field).
    *
    * Returns None on MALFORMED quoting — a quote opening mid-field,
    * text after a closing quote, or an unterminated quote. A
    * best-effort parse of such a line can disagree with what Spark's
    * CSV parser reproduces for the same header, so the caller must
    * route the file as a classification failure, never trust the
    * tokens.
    */
  private[stream] def splitCsvLine(line: String): Option[Seq[String]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    var justClosed = false // a quoted field just ended; only ',' may follow
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') {
            cur.append('"'); i += 1
          } else { inQ = false; justClosed = true }
        } else cur.append(c)
      } else c match {
        case '"' =>
          if (cur.nonEmpty || justClosed) return None // quote mid-field
          inQ = true
        case ',' =>
          out += cur.result(); cur.clear(); justClosed = false
        case o =>
          if (justClosed) return None // text after a closing quote
          cur.append(o)
      }
      i += 1
    }
    if (inQ) return None // unterminated quote
    out += cur.result()
    Some(out.toSeq)
  }

  /** The single-split size limit for the per-file line-number contract
    * (`spark.sql.files.maxPartitionBytes`, parsed with Spark's own
    * byte-string rules so both "2048" and "128MB" forms work).
    */
  private def maxPartitionBytes(spark: SparkSession): Long =
    org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))

  /** The split size Spark will actually use for a scan over files of
    * the given sizes — `FilePartition.maxSplitBytes` re-derived:
    * min(maxPartitionBytes, max(openCostInBytes, bytesPerCore)) with
    * bytesPerCore = Σ(size + openCost) / minPartitionNum, and
    * minPartitionNum defaulting through leafNodeDefaultParallelism to
    * the cluster's default parallelism. A file ≤ this is guaranteed a
    * single input split (Spark chunks each file at exactly this
    * stride); `spark.sql.files.maxPartitionNum` can only COARSEN
    * splits further, so the bound stays safe under it.
    */
  private[stream] def effectiveMaxSplitBytes(
      spark: SparkSession, sizes: Iterable[Long]): Long = {
    val bytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes _
    val defaultMax = maxPartitionBytes(spark)
    val openCost = bytes(
      spark.conf.get("spark.sql.files.openCostInBytes", "4MB"))
    val minPartitionNum =
      spark.conf.getOption("spark.sql.files.minPartitionNum")
        .orElse(spark.conf.getOption("spark.sql.leafNodeDefaultParallelism"))
        .map(_.toInt)
        .getOrElse(spark.sparkContext.defaultParallelism)
        .max(1)
    val totalBytes = sizes.map(_ + openCost).sum
    val bytesPerCore = totalBytes / minPartitionNum
    math.min(defaultMax, math.max(openCost, bytesPerCore))
  }

  private def countDataLines(p: Path): Long =
    try {
      val s = Files.lines(p)
      try s.skip(1).filter(l => l.trim.nonEmpty).count()
      finally s.close()
    } catch { case _: Exception => Long.MaxValue } // unreadable ⇒ don't sweep

  /** Start the streaming query (T1: 5 s trigger; T2: initial backlog is
    * the file source's first batch; T3: checkpointed exactly-once).
    *
    * `onBatch` observes each micro-batch's per-file outcomes (driver
    * side, AFTER routing) — a test/metrics hook; the default discards
    * them. The outcome list is bounded by `maxFilesPerTrigger` when
    * set, which is the backpressure contract the file-count-scale spec
    * pins.
    */
  def start(spark: SparkSession, conf: PipelineConf, sink: BatchSink,
      onBatch: Seq[FileOutcome] => Unit = _ => ()): StreamingQuery = {
    // T5: files whose sink write failed in a PREVIOUS run are re-driven
    // here, before the stream starts — a same-checkpoint restart must
    // recover them (the source itself never re-emits a seen path).
    val startupRetries = retryPending(spark, conf, sink)
    if (startupRetries.nonEmpty) onBatch(startupRetries)
    val reader = spark.readStream
      .option("header", "true")
      .option("pathGlobFilter", "*.csv")
      // A checkpoint-replayed batch lists the exact files of the failed
      // trigger; any of them ALREADY moved (a retry pass committed it
      // before the abort, an operator intervened) must scan as zero
      // rows, not kill every replay of the batch forever.
      .option("ignoreMissingFiles", "true")
      .schema(Schemas.sensorCsvRaw)
    // Backpressure: bound files per micro-batch so a restart against a
    // deep backlog doesn't become one giant batch/transaction.
    conf.maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n))
    val raw = reader
      .csv(conf.dataDir)
      .withColumn("__file", input_file_name())
    raw.writeStream
      .queryName("graft-ingest")
      .trigger(Trigger.ProcessingTime(s"${conf.monitorIntervalSec} seconds"))
      .option("checkpointLocation", conf.checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Ledgered retries ride each data-bearing trigger, oldest
        // work first — the reference's next-scan ordering — EXCEPT
        // markers for files the current batch itself lists (a replayed
        // batch re-lists a file whose sink failed last attempt): those
        // defer to processBatch, which is about to drive them anyway.
        // The file list comes from the plan's FileIndex (driver-side,
        // no scan). The empty-file sweep runs LAST, after BOTH
        // processBatch passes: it physically moves files, and a
        // header-only file discovered in THIS trigger is listed in the
        // current batch's scan — sweeping it from inside the retry
        // pass (as processBatch itself once did) made the outer
        // batch's own actions unreadable on replay.
        val batchNames =
          try batch.inputFiles
            .map(u => FsRouting.toLocalPath(u).getFileName.toString).toSet
          catch { case scala.util.control.NonFatal(_) => Set.empty[String] }
        onBatch(retryPending(spark, conf, sink, exclude = batchNames) ++
          processBatch(conf, sink, batch) ++
          sweepEmptyFiles(conf)); ()
      }
      .start()
  }
}
