package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.Ordinal

/** The reference's batch prep job (`preprocessing_kaggle_dataset.py`)
  * composed end-to-end: rename → project → round-robin sensor tag →
  * timestamp normalize → dropna → chunk split → chunked CSV write
  * (§3.2 of SURVEY.md). One declarative plan; the only shuffle is the
  * range partition for positional chunk ids.
  */
object PrepJob {

  /** Column renames of the Kaggle weather CSV
    * (`preprocessing_kaggle_dataset.py:25-30`).
    */
  val kaggleRenames: Seq[(String, String)] = Seq(
    "Formatted Date" -> "timestamp",
    "Temperature (C)" -> "temperature",
    "Humidity" -> "humidity",
    "Pressure (millibars)" -> "pressure")

  /** Round-robin sensor domain (`preprocessing_kaggle_dataset.py:9`). */
  val sensorIds: Seq[String] =
    Seq("Kaggle_Weather_01", "Kaggle_Weather_02", "Kaggle_Weather_03")

  /** The full prep transformation. `orderCol` fixes the row order that
    * the reference gets implicitly from the CSV (`i % 3` tagging and
    * chunking are positional; Spark needs the order declared).
    */
  def prepare(raw: DataFrame, orderCol: String, chunkRows: Int = 5000): DataFrame = {
    val renamed = kaggleRenames.foldLeft(raw) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to)
    }
    val projected = renamed.select(
      col(orderCol), col("timestamp"), col("temperature"),
      col("humidity"), col("pressure"))
    val tagged = Prep.roundRobinTag(projected, sensorIds, col(orderCol), "sensor_id")
    val normalized = tagged.withColumn("timestamp",
      Prep.tsParseFormat(graft.ops.Cleanse.tryTimestamp(col("timestamp"))))
    val clean = Validate.dropNaAny(normalized,
      Seq("timestamp", "sensor_id", "temperature", "humidity", "pressure"))
    Prep.chunkSplit(clean, chunkRows, col(orderCol), "chunk")
      .select("timestamp", "sensor_id", "temperature", "humidity",
        "pressure", "chunk")
  }

  /** K6: write ≤`chunkRows`-row CSV chunks. `partitionBy(chunk)` gives
    * one directory per chunk with a single file each (the chunk column
    * is a contiguous row range, so each chunk lands in few partitions;
    * coalescing within the chunk is done by the range partitioning
    * already performed for the ordinal).
    */
  def writeChunkedCsv(prepared: DataFrame, outDir: String): Unit =
    prepared
      .repartition(col("chunk"))
      .write.mode("overwrite")
      .option("header", "true")
      .partitionBy("chunk")
      .csv(outDir)
}
