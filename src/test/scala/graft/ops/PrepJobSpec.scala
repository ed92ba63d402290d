package graft.ops

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSpec

class PrepJobSpec extends SparkSpec {
  import spark.implicits._

  private def kaggleRaw(n: Int) = (0 until n).map { i =>
    (i.toLong, f"2006-04-01 ${i % 24}%02d:00:00.000 +0200",
      9.47 + i, 0.89, 1015.13)
  }.toDF("row_id", "Formatted Date", "Temperature (C)", "Humidity",
    "Pressure (millibars)")

  test("prepare: rename, tag, normalize, chunk — full composition") {
    val out = PrepJob.prepare(kaggleRaw(12), "row_id", chunkRows = 5)
    assert(out.columns.toSeq === Seq(
      "timestamp", "sensor_id", "temperature", "humidity", "pressure", "chunk"))
    val rows = out.orderBy("timestamp").collect()
    assert(rows.length === 12)
    // round-robin tags cycle in row order
    assert(rows.take(3).map(_.getAs[String]("sensor_id")).toSeq ===
      PrepJob.sensorIds)
    // timestamps normalized to seconds format (offset-parsed)
    assert(rows.head.getAs[String]("timestamp")
      .matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"""))
    // chunks of 5: 5+5+2
    val chunks = out.groupBy("chunk").count()
      .as[(Long, Long)].collect().toMap
    assert(chunks === Map(0L -> 5L, 1L -> 5L, 2L -> 2L))
  }

  test("dropna removes rows that fail timestamp normalization") {
    val bad = Seq((0L, "GARBAGE", 1.0, 0.5, 1000.0), (1L, "2006-04-01 10:00:00", 2.0, 0.5, 1000.0))
      .toDF("row_id", "Formatted Date", "Temperature (C)", "Humidity",
        "Pressure (millibars)")
    assert(PrepJob.prepare(bad, "row_id").count() === 1)
  }

  test("writeChunkedCsv: one directory per chunk, headers, row counts") {
    val dir = Files.createTempDirectory("graft_chunks").toString
    PrepJob.writeChunkedCsv(PrepJob.prepare(kaggleRaw(12), "row_id", 5), dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() === 12)
    assert(back.select("chunk").distinct().count() === 3)
    // each chunk dir exists with csv part files
    assert(Files.list(Paths.get(dir)).iterator().hasNext)
  }
}
