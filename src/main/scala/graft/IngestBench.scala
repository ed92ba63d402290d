package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.SparkSession
import graft.config.PipelineConf
import graft.sink.ParquetSink
import graft.stream.Ingest

/** Flagship-ingest throughput bench: the reference's headline workload
  * (20 CSV files = 19×5000 + 1,453 rows = 96,453 sensor rows;
  * `logs/pipeline.log` 2025-05-26 12:37:49→12:38:05, 16.57 s ≈ 5,820
  * rows/s end-to-end read→validate→aggregate→insert→move) driven
  * through `stream/Ingest` end-to-end in parquet-sink mode: watched
  * dir → checkpointed file source → one distributed validate pass →
  * group commit → per-file move to processed/.
  *
  * Methodology mirrors `Bench`: one full warmup run on a SEPARATE
  * workload dir pays session/codegen/stream-initialization cost, then
  * the timed run measures start-to-quiescence over a fresh backlog —
  * the same window the reference's log timestamps span (its process
  * was already warm when file 1 arrived). Lenient validation, like
  * the reference's headline run. Prints ONE JSON line.
  *
  * Usage: `sbt "runMain graft.IngestBench"` (SPARK_GRAFT_CPUS to
  * override parallelism; SPARK_GRAFT_INGEST_FILES/ROWS to scale the
  * workload).
  */
object IngestBench {

  private def writeWorkload(dataDir: Path, files: Int, rowsPerFile: Int,
      lastFileRows: Int): Long = {
    var total = 0L
    (1 to files).foreach { f =>
      val n = if (f == files) lastFileRows else rowsPerFile
      val sb = new StringBuilder(n * 48)
      sb.append("timestamp,sensor_id,temperature,humidity,pressure\n")
      var i = 0
      while (i < n) {
        // valid, in-range readings; varied sensors and timestamps
        val hh = (i / 3600) % 24
        val mm = (i / 60) % 60
        val ss = i % 60
        sb.append(f"2025-05-26 $hh%02d:$mm%02d:$ss%02d,S${i % 10},")
          .append(f"${20.0 + (i % 25)}%.1f,${0.30 + (i % 60) * 0.01}%.2f,")
          .append(f"${990.0 + (i % 50)}%.2f\n")
        i += 1
      }
      Files.writeString(dataDir.resolve(f"sensor_$f%02d.csv"), sb.toString)
      total += n
    }
    total
  }

  /** One full ingest run to quiescence; returns (rows, seconds). */
  private def runOnce(spark: SparkSession, root: Path,
      files: Int, rowsPerFile: Int, lastFileRows: Int): (Long, Double) = {
    val dataDir = Files.createDirectories(root.resolve("data"))
    val conf = PipelineConf(
      dataDir = dataDir.toString,
      processedDir = root.resolve("processed").toString,
      quarantineDir = root.resolve("quarantine").toString,
      checkpointDir = root.resolve("checkpoint").toString,
      monitorIntervalSec = 1,
      strictMode = false)
    val rows = writeWorkload(dataDir, files, rowsPerFile, lastFileRows)
    val sink = new ParquetSink(
      root.resolve("raw").toString, root.resolve("agg").toString)
    val t0 = System.nanoTime()
    val q = Ingest.start(spark, conf, sink)
    // Clock stops at QUIESCENCE (the documented window); q.stop()'s
    // stream-thread shutdown can absorb up to a trigger interval and
    // must not count against throughput.
    val sec =
      try { q.processAllAvailable(); (System.nanoTime() - t0) / 1e9 }
      finally q.stop()
    val moved = Files.list(root.resolve("processed"))
    val processed = try moved.count() finally moved.close()
    require(processed == files,
      s"expected $files files in processed/, got $processed")
    // The throughput claim divides rows WRITTEN by wall time — so the
    // sink must actually have received every one of them. Lenient
    // mode would silently drop rows a validation regression rejects
    // and still move all the files; this count turns that into a
    // loud failure instead of an inflated rows/s figure.
    val sunk = spark.read.parquet(root.resolve("raw").toString).count()
    require(sunk == rows, s"sink has $sunk rows, workload wrote $rows — " +
      "rows were dropped; the throughput figure would be a lie")
    (rows, sec)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val files = sys.env.getOrElse("SPARK_GRAFT_INGEST_FILES", "20").toInt
    val rowsPerFile = sys.env.getOrElse("SPARK_GRAFT_INGEST_ROWS", "5000").toInt
    // The reference's 20th file has 1,453 rows; that tail only applies
    // to the DEFAULT workload — a scaled probe (FILES/ROWS overridden)
    // gets uniform files, otherwise FILES=1 would silently measure a
    // 1,453-row corpus whatever ROWS asked for.
    val isReferenceWorkload =
      !sys.env.contains("SPARK_GRAFT_INGEST_FILES") &&
        !sys.env.contains("SPARK_GRAFT_INGEST_ROWS")
    val lastFileRows = if (isReferenceWorkload) 1453 else rowsPerFile
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.prepare(spark)

    val warmRoot = Files.createTempDirectory("graft_ingest_warm")
    runOnce(spark, warmRoot, files = 3, rowsPerFile = 500, lastFileRows = 500)

    // The deferred per-file move loop is the one O(files) driver-side
    // tail in the batch; report its share so a deep small-file backlog
    // probe shows whether the sequential renames ever dominate.
    Ingest.moveLoopNanos.set(0L)
    val root = Files.createTempDirectory("graft_ingest_bench")
    val (rows, sec) = runOnce(spark, root, files, rowsPerFile, lastFileRows)
    val rps = rows / sec
    val moveSec = Ingest.moveLoopNanos.get() / 1e9
    val moveShare = moveSec / sec
    // The reference's 5,820 rows/s was measured on ITS default workload
    // (20 files = 96,453 rows) only — a scaled probe must not carry the
    // figure, or its JSON line reads as apples-to-apples against a
    // workload shape the reference never ran. Keyed on env presence,
    // NOT lastFileRows == 1453: SPARK_GRAFT_INGEST_ROWS=1453 is a
    // scaled probe too (uniform files), and must not carry the figure.
    val baselineField =
      if (isReferenceWorkload) ""","baseline_rows_per_sec":5820""" else ""
    println(
      f"""{"metric":"ingest_rows_per_sec","value":$rps%.0f,"unit":"rows/s","rows":$rows,"files":$files,"sec":$sec%.2f,"move_sec":$moveSec%.3f,"move_share":$moveShare%.4f$baselineField}""")
    spark.stop()
  }
}
