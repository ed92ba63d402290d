package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.StructType

/** Bridge to Spark's classic Column ⇄ Expression conversions, which are
  * `private[sql]` in Spark 4's unified Column API. Lives in the
  * `org.apache.spark.sql` package solely to satisfy that access scope —
  * the standard pattern for libraries contributing custom Catalyst
  * expressions (the same access `functions._` uses internally).
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The physical plan's RDD[InternalRow] — lets per-partition operators
    * (e.g. global row numbering) work on unsafe rows directly instead of
    * paying the InternalRow→Row conversion of `Dataset.rdd`.
    */
  def toInternalRdd(df: Dataset[Row]): RDD[InternalRow] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd

  /** Wrap an InternalRow RDD back into a DataFrame without the
    * Row-conversion round trip (`SparkSession.internalCreateDataFrame`
    * is `private[sql]`).
    */
  def internalCreateDataFrame(
      spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Re-root a DataFrame's LOGICAL plan at its physical RDD: the
    * result is semantically identical but its analyzed plan is a
    * single `LogicalRDD` leaf. For iterative jobs (PageRank,
    * connected components) this is what keeps per-round analysis cost
    * O(1) — persist() alone caches DATA but keeps the full logical
    * history, so round N's plan is N rounds deep and total planning
    * cost is O(N²). Unlike `localCheckpoint` the RDD lineage is
    * preserved, so lost cached blocks recompute instead of failing
    * the job, and the caller keeps explicit persist/unpersist control.
    * Lazy: nothing executes until the returned frame is acted on.
    */
  def planLeaf(df: Dataset[Row]): DataFrame =
    internalCreateDataFrame(df.sparkSession, toInternalRdd(df), df.schema)

  /** Register a native-expression SQL function on a LIVE session
    * (`sessionState.functionRegistry` is `private[sql]`). The
    * config-time path is `spark.sql.extensions=graft.plans.
    * GraftExtensions`; this is the runtime equivalent for sessions the
    * caller doesn't build.
    */
  def registerFunction(
      spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)
}
