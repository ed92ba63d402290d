package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.{Sampling, TextStats}
import graft.ops.AsOf

/** Plan CONTRACTS: the scale properties this library promises are
  * structural facts of the physical plan — zero-shuffle projections
  * stay shuffle-free, the quota top-k stays an aggregate (never a
  * window), the as-of join stays a single key shuffle. These specs
  * pin them so a refactor that silently regresses the plan shape
  * (not the answer) still fails CI.
  */
class PlanContractSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private lazy val docs = (0L until 100L)
    .map(i => (i, s"tok$i tok${i % 7} tok${i % 3} filler words here", "en", i % 5))
    .toDF("doc_id", "text", "lang", "source")

  test("hash sampling / split assignment / chunking plan with ZERO exchanges") {
    val sampled = Sampling.stratifiedHashSample(
      docs, "doc_id", "lang", Map("en" -> 50), 10)
    val split = Sampling.splitAssign(docs, "doc_id")
    val chunks = TextStats.tokenWindowChunks(docs, "doc_id", "text", 4, 1)
    Seq(sampled, split, chunks).foreach { df =>
      assert(!plan(df).contains("Exchange"), s"unexpected shuffle:\n${plan(df)}")
    }
  }

  test("quotaCap plans as a partial-pruning aggregate, never a window") {
    val df = Sampling.quotaCap(docs, Seq("lang"), "source", "doc_id", 3)
    val p = plan(df)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_graft_top_k"), p) // map-side prune visible
    assert(!p.contains("Window"), s"quota must not fall back to a window:\n$p")
  }

  test("asOfJoin is one key shuffle + one window pass (no join operator)") {
    val events = Seq((1L, "a", 10L)).toDF("id", "k", "ts")
    val rates = Seq(("a", 5L, 1.0)).toDF("k", "rts", "rate")
    val p = plan(AsOf.asOfJoin(events, rates, Seq("k"), "ts", "rts"))
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    // exactly one exchange: the window's hash partitioning on the key
    val exchanges = "(?<!Reused)Exchange".r.findAllIn(p).length
    assert(exchanges === 1, s"expected 1 exchange, got $exchanges:\n$p")
  }

  test("top-k by value plans as TakeOrderedAndProject (no global sort)") {
    val events = (0L until 50L).map(i => (i % 7, i.toDouble)).toDF("user_id", "value")
    val p = plan(events.groupBy($"user_id")
      .agg(sum($"value").as("total_value"))
      .orderBy($"total_value".desc).limit(5))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("\nSort "), s"no global sort expected:\n$p")
  }

  test("revenueMonthly pre-aggregates the fact side below the join") {
    val li = Seq((1L, 10.0, 0.1)).toDF("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "P"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val p = plan(graft.ext.Analytics.revenueMonthly(li, ord))
    // the per-orderkey partial aggregate must sit under the join
    val joinIdx = p.indexOf("Join")
    val aggIdx = p.lastIndexOf("HashAggregate")
    assert(joinIdx >= 0 && aggIdx > joinIdx,
      s"fact side must be pre-aggregated below the join:\n$p")
  }
}
