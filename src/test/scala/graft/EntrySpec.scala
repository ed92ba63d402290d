package graft

/** The driver's flagship smoke contract: `SparkEntry.entry` must return
  * rows on sf0.001 with nothing but a SparkSession — every session
  * conf it needs (ANSI off, parquet nanosAsLong, UTC) is applied by
  * `Tables.prepare` inside the query, not assumed from the caller.
  */
class EntrySpec extends SparkSpec {
  test("flagship entry returns rows and the expected aggregate shape") {
    val df = SparkEntry.entry(spark)
    val n = df.count()
    assert(n > 0, "flagship query returned no rows")
    // long-format metric aggregate: one row per (user, metric)
    assert(df.columns.contains("metric_name"))
    assert(df.columns.contains("record_count"))
  }
}
