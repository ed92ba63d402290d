package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: print the formatted physical plan of one or more
  * inventory queries. Usage:
  *   runMain graft.Explain <sfDir> <queryKey> [queryKey ...]
  *   runMain graft.Explain <sfDir> all
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <sfDir> <queryKey...>|all")
    val dir = args(0)
    val keys =
      if (args(1) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.prepare(spark)
    // GRAFT_EXPLAIN_RUN=1: execute the query first and print the FINAL
    // adaptive plan (shows AQE decisions — ReusedExchange, join
    // strategy changes, coalesced partitions) instead of the static one.
    val runFirst = sys.env.get("GRAFT_EXPLAIN_RUN").contains("1")
    keys.foreach { k =>
      val fn = SparkEntry.queries.getOrElse(k,
        sys.error(s"unknown query key: $k"))
      println(s"\n========== $k ==========")
      val df = fn(spark, dir)
      if (runFirst) {
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
