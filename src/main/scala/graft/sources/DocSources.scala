package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** [EXT] Batch document readers for the formats a training-data corpus
  * actually arrives in besides parquet: JSON-lines and CSV.
  *
  * Scale rules baked in:
  *   - EXPLICIT schema, never inference — schema inference reads the
  *     whole input once before the real scan (2× I/O at 100 TB) and can
  *     silently change types between drops;
  *   - `mode=PERMISSIVE` + a corrupt-record column so one malformed
  *     line quarantines a ROW, not a 100 GB file — callers route
  *     `_corrupt_record IS NOT NULL` to their quarantine path;
  *   - JSONL/CSV are splittable line formats: Spark parallelizes within
  *     a file by `maxPartitionBytes`, so a single giant corpus file
  *     still fans out across the cluster.
  */
object DocSources {

  /** The documents-table schema (matches the parquet testdata), plus a
    * corrupt-record capture column.
    */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  private val dataSchema = StructType(docSchema.filterNot(
    _.name == "_corrupt_record"))

  /** Well-formed documents from JSON-lines; malformed lines are dropped
    * AT THE SOURCE (`DROPMALFORMED`) — filtering a PERMISSIVE read on
    * its corrupt-record column instead would throw once column pruning
    * leaves only that column in the scan (e.g. on a bare `.count()`).
    * Use [[jsonlRaw]] to ROUTE malformed lines instead of dropping.
    */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(dataSchema)
      .option("mode", "DROPMALFORMED")
      .json(path)

  /** JSONL with the corrupt-record column retained for routing. Always
    * project at least one data column alongside `_corrupt_record` —
    * Spark rejects queries over ONLY the corrupt column.
    */
  def jsonlRaw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(docSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Well-formed documents from headered CSV (quoted text fields);
    * malformed rows dropped at the source (see [[jsonl]]).
    */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(dataSchema)
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .option("multiLine", "false") // multiLine kills splittability
      .csv(path)

  /** CSV with the corrupt-record column retained for routing (see
    * [[jsonlRaw]]'s projection caveat).
    */
  def csvRaw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(docSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("multiLine", "false") // multiLine kills splittability
      .csv(path)

  /** STREAMING JSONL corpus source: watch a directory for document
    * drops (the training-data analog of the sensor-CSV watch). The file
    * source's checkpoint log gives exactly-once per file; compose with
    * `TextClean.scrub` / quality gates / [[graft.stream.StreamDedup]]
    * downstream — they are ordinary Columns and stateful ops.
    */
  def jsonlStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(dataSchema)
      .option("mode", "DROPMALFORMED")
      .option("pathGlobFilter", "*.jsonl")
      .json(path)

  /** Columnar ORC corpus (the other splittable columnar lake format;
    * Spark ships native ORC support). Predicate pushdown and column
    * pruning work exactly as for parquet — the reader is
    * interchangeable with `spark.read.parquet` for all downstream
    * operators.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC writer with optional hive-style partition columns.
    * `zstd`: best size/speed on text-heavy corpora; partitioning by a
    * low-cardinality column (lang, source, date) turns matching
    * filters into partition PRUNING — files never opened, the cheapest
    * scan there is.
    */
  def writeOrc(
      df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").option("compression", "zstd")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }
}
