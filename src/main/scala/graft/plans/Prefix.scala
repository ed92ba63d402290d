package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed running (prefix) sum over a global order.
  *
  * The naive Spark form — `sum(v).over(Window.orderBy(k).rowsBetween(
  * unboundedPreceding, currentRow))` — collapses the table into ONE
  * partition, exactly like the global row-number problem [[Ordinal]]
  * solves. Same cure: range-partition + sort by the key (bounded
  * per-partition work), then two passes over the SAME materialized
  * shuffle lineage — (1) per-partition totals, (2) a scan that adds
  * each partition's carry-in offset. The totals pass and the main pass
  * share one shuffle write (Spark reuses map outputs across jobs on a
  * shared lineage), and both run on `queryExecution.toRdd` InternalRows
  * — no Row-conversion tax (see Ordinal's design notes for why NOT
  * `spark_partition_id()` two-job variants: AQE coalescing may differ
  * between jobs and silently corrupt the offsets; RDD lineages are
  * AQE-free).
  *
  * Driver state is one Long per partition — bounded at any data size.
  */
object Prefix {

  /** Adds `outCol` = inclusive running sum of `valueCol` in `order`.
    * `order` must be deterministic and unique; `valueCol` must be a
    * non-null LongType column (cast upstream).
    */
  def withRunningSum(
      df: DataFrame,
      order: Seq[Column],
      valueCol: String,
      outCol: String,
      numPartitions: Option[Int] = None): DataFrame =
    withRunningSums(df, order, Seq(valueCol -> outCol), numPartitions)

  /** N running sums in ONE range shuffle + one carry pass — the
    * multi-measure form (e.g. both empirical CDFs of a two-sample
    * comparison accumulate over the same value order; two
    * single-measure calls would pay the range shuffle twice).
    */
  def withRunningSums(
      df: DataFrame,
      order: Seq[Column],
      valueOutCols: Seq[(String, String)],
      numPartitions: Option[Int] = None): DataFrame = {
    require(valueOutCols.nonEmpty, "at least one (value, out) pair")
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(
      spark.sessionState.conf.numShufflePartitions)
    val sorted = df
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    valueOutCols.foreach { case (v, _) =>
      require(sorted.schema(v).dataType == LongType,
        s"$v must be LongType, got ${sorted.schema(v).dataType}")
    }
    val vIdxs = valueOutCols.map { case (v, _) =>
      sorted.schema.fieldIndex(v)
    }.toArray
    val k = vIdxs.length
    val rdd = GraftExpressionBridge.toInternalRdd(sorted)
    // Pass 1: per-partition totals (driver gets k Longs per partition).
    val partTotals: Array[Array[Long]] = rdd
      .mapPartitions { iter =>
        val s = new Array[Long](k)
        iter.foreach { r =>
          var i = 0
          while (i < k) { s(i) += r.getLong(vIdxs(i)); i += 1 }
        }
        Iterator.single(s)
      }
      .collect()
    val offsets = partTotals.scanLeft(new Array[Long](k)) { (acc, t) =>
      Array.tabulate(k)(i => acc(i) + t(i))
    }
    // Pass 2: sequential scan per partition, carry-in from offsets.
    val schema = valueOutCols.foldLeft(sorted.schema) { case (s, (_, o)) =>
      s.add(o, LongType, nullable = false)
    }
    val summed = rdd.mapPartitionsWithIndex { (pid, iter) =>
      val proj = UnsafeProjection.create(schema)
      val extra = new GenericInternalRow(k)
      val joined = new JoinedRow
      val running = offsets(pid).clone()
      iter.map { row =>
        var i = 0
        while (i < k) {
          running(i) += row.getLong(vIdxs(i))
          extra.setLong(i, running(i))
          i += 1
        }
        proj(joined(row, extra)): InternalRow
      }
    }
    GraftExpressionBridge.internalCreateDataFrame(spark, summed, schema)
  }

  /** Sequence packing, "concat then chunk" semantics: documents are
    * laid end-to-end in `order` and cut into fixed `budget`-token bins —
    * the standard pretraining packing layout. Each document is assigned
    * the bin its FIRST token falls in (documents may straddle a
    * boundary; the training loader splits those at read time).
    *
    * Output adds: `cumCol` (inclusive running token total) and `binCol`
    * (0-based bin = startOffset div budget).
    */
  def packBins(
      df: DataFrame,
      order: Seq[Column],
      tokenCountCol: String,
      budget: Long,
      cumCol: String = "cum_tokens",
      binCol: String = "bin_id"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    withRunningSum(df, order, tokenCountCol, cumCol)
      // Non-negative longs: `div` (integral division) == floor
      // division. Identifiers are backtick-quoted: a raw interpolation
      // of a name like `n-tokens` would PARSE as arithmetic (or
      // resolve against unrelated columns) instead of erroring.
      .withColumn(binCol,
        expr(s"(`$cumCol` - `$tokenCountCol`) div $budget"))
  }
}
