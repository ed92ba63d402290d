package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.SparkSpec

class StreamQualitySpec extends SparkSpec {
  import spark.implicits._

  private val checks = Seq(
    "v_present" -> col("v").isNull,
    "v_in_range" -> (col("v").isNull || !col("v").between(0.0, 100.0)))

  test("gatedIngest commits clean batches and quarantines poisoned ones") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val committed = scala.collection.mutable.ArrayBuffer.empty[Long]
    val quarantined = scala.collection.mutable.ArrayBuffer.empty[Long]
    val verdicts = scala.collection.mutable.ArrayBuffer.empty[StreamQuality.BatchVerdict]

    val q = StreamQuality.gatedIngest(
      mem.toDF().toDF("id", "v"),
      checks, minPassRate = 0.8,
      commit = b => committed.synchronized {
        committed ++= b.select("id").as[Long].collect() },
      quarantine = b => quarantined.synchronized {
        quarantined ++= b.select("id").as[Long].collect() },
      onReport = v => verdicts.synchronized { verdicts += v })
    try {
      // batch 1: all 5 rows valid -> commit
      mem.addData((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (5L, 5.0))
      q.processAllAvailable()
      // batch 2: 3 of 5 out of range -> pass_rate 0.4 < 0.8 -> quarantine
      mem.addData((6L, 1.0), (7L, 999.0), (8L, -1.0), (9L, 500.0), (10L, 2.0))
      q.processAllAvailable()

      assert(committed.sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      assert(quarantined.sorted.toSeq === Seq(6L, 7L, 8L, 9L, 10L))
      val byPass = verdicts.filter(_.report.nonEmpty).map(_.pass).toSeq
      assert(byPass === Seq(true, false))
      // the failing batch's report names the failing check
      val bad = verdicts.find(v => v.report.nonEmpty && !v.pass).get
      val rates = bad.report
        .map(r => r.getAs[String]("check_name") -> r.getAs[Double]("pass_rate"))
        .toMap
      assert(rates("v_present") === 1.0)
      assert(rates("v_in_range") === 0.4)
    } finally q.stop()
  }

  test("lenientIngest splits each batch: valid rows commit, bad quarantine") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Option[Double])]
    val committed = scala.collection.mutable.ArrayBuffer.empty[Long]
    val quarantined = scala.collection.mutable.ArrayBuffer.empty[Long]
    val verdicts = scala.collection.mutable.ArrayBuffer.empty[StreamQuality.BatchVerdict]
    val q = StreamQuality.lenientIngest(
      mem.toDF().toDF("id", "v"), checks,
      commit = b => committed.synchronized {
        committed ++= b.select("id").as[Long].collect() },
      quarantine = b => quarantined.synchronized {
        quarantined ++= b.select("id").as[Long].collect() },
      onReport = v => verdicts.synchronized { verdicts += v })
    try {
      // rows 3 (null) and 4 (out of range) violate; 1, 2, 5 are valid
      mem.addData((1L, Some(1.0)), (2L, Some(2.0)), (3L, None),
        (4L, Some(999.0)), (5L, Some(3.0)))
      q.processAllAvailable()
      assert(committed.sorted.toSeq === Seq(1L, 2L, 5L))
      assert(quarantined.sorted.toSeq === Seq(3L, 4L))
      // batch verdict is still honest: the batch did NOT pass clean
      assert(verdicts.exists(v => v.report.nonEmpty && !v.pass))
    } finally q.stop()
  }

  test("gatedIngest routes a whole batch on any failing check (strict)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Option[Double])]
    var committedRows = 0L
    var quarantinedRows = 0L
    val q = StreamQuality.gatedIngest(
      mem.toDF().toDF("id", "v"),
      checks, minPassRate = 0.95,
      commit = b => committedRows += b.count(),
      quarantine = b => quarantinedRows += b.count())
    try {
      // one null among 10 -> v_present pass_rate 0.9 < 0.95: whole batch out
      mem.addData((1L to 9L).map(i => (i, Some(i.toDouble))) :+
        (10L, Option.empty[Double]): _*)
      q.processAllAvailable()
      assert(committedRows === 0L && quarantinedRows === 10L)
    } finally q.stop()
  }
}
