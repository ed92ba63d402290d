package graft.stream

import java.nio.file.{Files, Path}
import graft.SparkSpec
import graft.config.PipelineConf
import graft.sink.ParquetSink

/** Streaming integration: drop reference-taxonomy fixtures into a
  * watched dir, run the query to quiescence, assert the per-file routing
  * and reason-log parity with `quarantine_log.txt`, then restart from
  * checkpoint and verify exactly-once (T3/T5).
  */
class IngestSpec extends SparkSpec {

  private def tmp(prefix: String): Path =
    Files.createTempDirectory(prefix)

  private def writeCsv(dir: Path, name: String, lines: String*): Path = {
    val p = dir.resolve(name)
    Files.writeString(p,
      ("timestamp,sensor_id,temperature,humidity,pressure" +: lines)
        .mkString("", "\n", "\n"))
    p
  }

  private def mkConf(root: Path): PipelineConf = PipelineConf(
    dataDir = root.resolve("data").toString,
    processedDir = root.resolve("processed").toString,
    quarantineDir = root.resolve("quarantine").toString,
    checkpointDir = root.resolve("checkpoint").toString,
    monitorIntervalSec = 1)

  test("end-to-end routing: clean commits+moves, dirty quarantines with reason, empty sweeps") {
    val root = tmp("graft_ingest")
    val conf = mkConf(root)
    val dataDir = Files.createDirectories(root.resolve("data"))
    val rawOut = root.resolve("raw").toString
    val aggOut = root.resolve("agg").toString

    writeCsv(dataDir, "clean.csv",
      "2025-05-26 04:36:08,S1,26.41,0.95,1014.74",
      "2025-05-26 04:37:08,S1,27.00,0.90,1015.00",
      "2025-05-26 04:38:08,S2,-4.35,0.90,1016.09")
    writeCsv(dataDir, "dirty.csv",
      "2025-05-26 04:36:08,S1,26.41,0.95,1014.74",
      "2025-05-26 04:37:08,S1,abc,0.95,1014.74")
    writeCsv(dataDir, "empty.csv") // header only

    val q = Ingest.start(spark, conf, new ParquetSink(rawOut, aggOut))
    try { q.processAllAvailable() } finally q.stop()

    // routing
    assert(Files.exists(root.resolve("processed/clean.csv")))
    assert(Files.exists(root.resolve("quarantine/dirty.csv")))
    assert(Files.exists(root.resolve("quarantine/empty.csv")))
    assert(!Files.exists(dataDir.resolve("clean.csv")))

    // reason log parity (quarantine_log.txt format)
    val log = Files.readString(root.resolve("quarantine/quarantine_log.txt"))
    assert(log.contains("File: dirty.csv, Reason: Validation failed at row 3: " +
      "Row 3: 'temperature' ('abc') is not a valid number."))
    assert(log.contains("File: empty.csv, Reason: " +
      "File is empty or contains only headers after NA filtering."))

    // sink contents: only the clean file's rows and aggregates
    val raw = spark.read.parquet(rawOut)
    assert(raw.count() === 3)
    val agg = spark.read.parquet(aggOut)
    assert(agg.count() === 6) // 2 sensors x 3 metrics
    assert(raw.select("file_name").distinct().collect()
      .map(_.getString(0)).toSet === Set("clean.csv"))
  }

  test("file with missing required columns is quarantined at the header check") {
    val root = tmp("graft_header")
    val conf = mkConf(root)
    val dataDir = Files.createDirectories(root.resolve("data"))
    val p = dataDir.resolve("badheader.csv")
    Files.writeString(p, // humidity/pressure missing from the header
      "timestamp,sensor_id,temperature" + System.lineSeparator() +
        "2025-05-26 04:36:08,S1,26.41" + System.lineSeparator())
    val q = Ingest.start(spark, conf,
      new ParquetSink(root.resolve("raw").toString, root.resolve("agg").toString))
    try { q.processAllAvailable() } finally q.stop()
    assert(Files.exists(root.resolve("quarantine/badheader.csv")))
    val log = Files.readString(root.resolve("quarantine/quarantine_log.txt"))
    assert(log.contains("File: badheader.csv, Reason: Missing critical columns: " +
      "humidity, pressure. Quarantining."))
  }

  test("checkpoint restart: old files not reprocessed, new files picked up") {
    val root = tmp("graft_restart")
    val conf = mkConf(root)
    val dataDir = Files.createDirectories(root.resolve("data"))
    val rawOut = root.resolve("raw").toString
    val aggOut = root.resolve("agg").toString
    val sink = new ParquetSink(rawOut, aggOut)

    writeCsv(dataDir, "first.csv",
      "2025-05-26 04:36:08,S1,26.41,0.95,1014.74")
    val q1 = Ingest.start(spark, conf, sink)
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(rawOut).count() === 1)

    writeCsv(dataDir, "second.csv",
      "2025-05-26 05:36:08,S2,20.00,0.80,1000.00")
    val q2 = Ingest.start(spark, conf, sink)
    try { q2.processAllAvailable() } finally q2.stop()

    val raw = spark.read.parquet(rawOut)
    assert(raw.count() === 2) // first.csv not duplicated
    assert(raw.select("file_name").distinct().count() === 2)
    assert(Files.exists(root.resolve("processed/first.csv")))
    assert(Files.exists(root.resolve("processed/second.csv")))
  }

  test("failing sink retains the file for retry; recovery commits it") {
    val root = tmp("graft_retry")
    val conf = mkConf(root)
    val dataDir = Files.createDirectories(root.resolve("data"))
    val rawOut = root.resolve("raw").toString
    val aggOut = root.resolve("agg").toString

    writeCsv(dataDir, "retry.csv",
      "2025-05-26 04:36:08,S1,26.41,0.95,1014.74")

    var fail = true
    val flaky = new graft.sink.BatchSink {
      val real = new ParquetSink(rawOut, aggOut)
      override def write(f: String, raw: org.apache.spark.sql.DataFrame,
          agg: org.apache.spark.sql.DataFrame): Boolean =
        if (fail) false else real.write(f, raw, agg)
    }

    val q1 = Ingest.start(spark, conf, flaky)
    try { q1.processAllAvailable() } finally q1.stop()
    // sink failed ⇒ file retained in data/ (T5)
    assert(Files.exists(dataDir.resolve("retry.csv")))
    assert(!Files.exists(root.resolve("processed/retry.csv")))

    // NOTE: the checkpointed source will not re-emit the same file; the
    // reference re-reads it on the next SCAN because its dedup set is
    // advisory. Retry here = a fresh query over the retained file with a
    // separate checkpoint (operationally: restart with clean offsets, or
    // an external retry queue; the sink's delete-then-insert keeps it
    // idempotent either way).
    fail = false
    val retryConf = conf.copy(checkpointDir = root.resolve("cp2").toString)
    val q2 = Ingest.start(spark, retryConf, flaky)
    try { q2.processAllAvailable() } finally q2.stop()
    assert(spark.read.parquet(rawOut).count() === 1)
    assert(Files.exists(root.resolve("processed/retry.csv")))
  }
}
