package graft

import org.apache.spark.sql.SparkSession
import graft.config.PipelineConf
import graft.sink.{JdbcSink, ParquetSink}
import graft.stream.Ingest

/** The `python pipeline.py` equivalent: start the streaming sensor-CSV
  * pipeline against a watched directory.
  *
  * Usage:
  *   runMain graft.PipelineMain <dataDir> [processedDir quarantineDir checkpointDir]
  *
  * Sink selection: if GRAFT_JDBC_URL is set (with GRAFT_JDBC_USER /
  * GRAFT_JDBC_PASSWORD), raw rows + aggregates go to MySQL exactly like
  * the reference (`store_data`, one transaction per file); otherwise the
  * lake-native parquet sink writes under <dataDir>/../{raw,agg}.
  *
  * Validation mode: GRAFT_LENIENT=1 selects the lenient pipeline
  * variant (drop invalid rows, commit the valid subset); default is the
  * reference's strict whole-file quarantine.
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("data")
    val root = java.nio.file.Paths.get(dataDir).toAbsolutePath.getParent
    def arg(i: Int, dflt: String) = args.lift(i).getOrElse(dflt)
    val conf = PipelineConf(
      dataDir = dataDir,
      processedDir = arg(1, root.resolve("processed").toString),
      quarantineDir = arg(2, root.resolve("quarantine").toString),
      checkpointDir = arg(3, root.resolve("checkpoint").toString),
      strictMode = !sys.env.get("GRAFT_LENIENT").exists(_ == "1"))

    val spark = SparkSession.builder()
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.prepare(spark)

    val sink = PipelineConf.jdbcFromEnv() match {
      case Some(jdbc) =>
        graft.sink.JdbcBootstrap.run(jdbc)
        new JdbcSink(jdbc)
      case None =>
        new ParquetSink(
          root.resolve("raw").toString, root.resolve("agg").toString)
    }

    val query = Ingest.start(spark, conf, sink)
    query.awaitTermination()
  }
}
