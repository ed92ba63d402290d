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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.prepare(spark)

    def globalWindows(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
    }

    var flagged = 0
    SparkEntry.queries.keys.toSeq.sorted
      .filter(_.startsWith(prefix)).foreach { k =>
        try {
          val df = SparkEntry.queries(k)(spark, dir)
          val hits = globalWindows(df.queryExecution.sparkPlan)
          hits.foreach { w =>
            flagged += 1
            // row estimate of the window's input, from stats if present
            val est = w.children.headOption
              .map(_.logicalLink.map(_.stats.sizeInBytes.toString)
                .getOrElse("?")).getOrElse("?")
            println(s"FLAG $k ${w.getClass.getSimpleName} inputBytes~$est")
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
