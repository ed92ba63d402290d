package graft.sink

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketedLakeSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join with zero Exchange (shuffle paid at write)") {
    val events = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
    val users = events.select(col("user_id")).distinct()
      .withColumn("segment", pmod(col("user_id"), lit(3)))

    try {
      BucketedLake.writeBucketed(events, "ev_bucketed",
        Seq("user_id"), buckets = 4, sortCols = Seq("user_id"))
      BucketedLake.writeBucketed(users, "us_bucketed",
        Seq("user_id"), buckets = 4, sortCols = Seq("user_id"))

      // force the join path (not broadcast) to expose the exchange-free plan
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("ev_bucketed")
          .join(spark.table("us_bucketed"), "user_id")
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"expected no shuffle in bucketed join plan:\n$plan")
        // and the answer is the same as the unbucketed join
        val expected = events.join(users, "user_id").count()
        assert(joined.count() === expected)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS us_bucketed")
    }
  }
}
