package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Static plan audit over the whole inventory: flag physical-plan
  * shapes that collapse to a single partition at scale —
  * `WindowExec`/`WindowGroupLimitExec` with an EMPTY partition spec
  * move every row through one task, the classic 100-TB bottleneck
  * that local[32] timings hide completely.
  *
  * Every flagged site must either be eliminated (distributed prefix
  * sums / Ordinal / bounded pre-aggregation) or carry a documented
  * bound: a global window over an already-bounded intermediate
  * (k rows, vocabulary-bounded, top-k'd) is fine; one over a scan is
  * not. Prints one line per flagged query: key, node, input estimate.
  *
  * Usage: runMain graft.PlanAudit <sfDir> [keyPrefix]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanAudit <sfDir> [keyPrefix]")
    val dir = args(0)
    val prefix = args.lift(1).getOrElse("")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // AQE off so executedPlan is the fully-prepared static plan —
      // with AQE on, exchanges are inserted lazily per query stage and
      // the audit would see a pre-EnsureRequirements tree.
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.prepare(spark)

    // executedPlan (exchanges inserted), unwrapped when AQE boxes it
    def prepared(df: org.apache.spark.sql.DataFrame): SparkPlan =
      df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.inputPlan
        case p => p
      }

    def globalWindows(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
      // any other shuffle that funnels everything into ONE partition
      // (global sort-limit exchanges excluded — those are top-k'd)
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.outputPartitioning.numPartitions == 1 => e
    }

    var flagged = 0
    SparkEntry.queries.keys.toSeq.sorted
      .filter(_.startsWith(prefix)).foreach { k =>
        try {
          val df = SparkEntry.queries(k)(spark, dir)
          val hits = globalWindows(prepared(df))
          hits.foreach { w =>
            flagged += 1
            // the immediate child tells the story: a partial aggregate
            // below a 1-partition exchange is the standard global-agg
            // merge (rows = #partitions, always safe); anything else
            // needs a boundedness argument
            def unwrap(p: SparkPlan): SparkPlan = p match {
              case c: org.apache.spark.sql.execution
                .WholeStageCodegenExec => unwrap(c.child)
              case c: org.apache.spark.sql.execution
                .InputAdapter => unwrap(c.child)
              case other => other
            }
            val child = w.children.headOption.map(unwrap)
              .map(c => c.getClass.getSimpleName +
                (c match {
                  case a: org.apache.spark.sql.execution.aggregate
                    .BaseAggregateExec =>
                    val partial = a.aggregateExpressions.forall(
                      _.mode.toString.contains("Partial"))
                    if (partial) "(partial)" else "(final)"
                  case _ => ""
                })).getOrElse("?")
            println(s"FLAG $k ${w.getClass.getSimpleName} child=$child")
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            println(s"ERR  $k ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    println(s"== $flagged global-window site(s) ==")
    spark.stop()
  }
}
