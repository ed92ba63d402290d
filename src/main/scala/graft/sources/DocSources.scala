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

  private def clean(df: DataFrame): DataFrame =
    df.filter(df.col("_corrupt_record").isNull).drop("_corrupt_record")

  /** Well-formed documents from JSON-lines; malformed lines are dropped
    * here (use [[jsonlRaw]] to route them instead).
    */
  def jsonl(spark: SparkSession, path: String): DataFrame =
    clean(jsonlRaw(spark, path))

  /** JSONL with the corrupt-record column retained for routing. */
  def jsonlRaw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(docSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Well-formed documents from headered CSV (quoted text fields). */
  def csv(spark: SparkSession, path: String): DataFrame =
    clean(csvRaw(spark, path))

  /** CSV with the corrupt-record column retained for routing. */
  def csvRaw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(docSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("multiLine", "false") // multiLine kills splittability
      .csv(path)
}
