package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the best `k` (score, id) pairs per
  * group by (score desc, id asc), with PARTIAL aggregation — each map
  * task holds at most k pairs per group, so a group with a billion rows
  * ships ≤ k·numPartitions pairs through the shuffle instead of a
  * billion. This is the aggregation-shaped alternative to
  * `row_number().over(Window.partitionBy(g).orderBy(s))`, whose plan
  * must shuffle EVERY row of a group to a single task before it can
  * rank anything — the classic hot-key straggler at scale.
  *
  * Buffer: a bounded priority queue ordered worst-first, so inserting
  * into a full buffer is one compare + O(log k) on improvement.
  * Deterministic for unique ids (ties in score break by id asc).
  *
  * Output: array<struct<id: long, score: double>>, best-first — index
  * position is the 1-based rank minus one.
  */
case class TopKAgg(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"k must be positive: $k")

  // Worst-first: head is the entry to evict — LOWEST score, then
  // HIGHEST id (since rank order is score desc, id asc).
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.fromLessThan { (a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    }

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKAgg.resultType

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def insert(
      buf: mutable.PriorityQueue[(Double, Long)],
      e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    // NaN scores are skipped: NaN compares false both ways under the
    // '>' ordering, which would corrupt the heap invariant and make
    // results insertion-order dependent.
    if (s != null && i != null && !java.lang.Double.isNaN(s.asInstanceOf[Double])) {
      insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // Best-first via a sorted COPY — eval must not mutate the buffer:
    // window-frame evaluation (AggregateProcessor) calls eval
    // repeatedly on one shared buffer, and a destructive drain would
    // return the top-k once and empty arrays afterwards.
    // Ascending under worstFirst = best first ("less" = better: higher
    // score, then lower id — the heap dequeues its max, the worst).
    val best = buf.toArray.sortWith(worstFirst.lt)
    new GenericArrayData(
      best.map { case (s, d) => new GenericInternalRow(Array[Any](d, s)): Any })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(8 + 16 * buf.size)
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.enqueue((in.readDouble(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "graft_top_k"
}

/** String-id sibling of [[TopKAgg]]: bounded top-k (score, id) pairs
  * by (score desc, id ASC — bytewise UTF8 order, matching Spark's and
  * DuckDB's binary string comparison), partial-aggregated. Null ids
  * and NaN scores are skipped. Output: array<struct<id: string,
  * score: double>>, best-first.
  */
case class TopKStrAgg(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, org.apache.spark.unsafe.types.UTF8String)]] {

  import org.apache.spark.unsafe.types.UTF8String

  require(k > 0, s"k must be positive: $k")

  // Worst-first: head is the entry to evict — LOWEST score, then
  // HIGHEST id (rank order is score desc, id asc).
  private val worstFirst: Ordering[(Double, UTF8String)] =
    Ordering.fromLessThan { (a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0)
    }

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKAgg.strResultType

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, UTF8String)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def insert(
      buf: mutable.PriorityQueue[(Double, UTF8String)],
      e: (Double, UTF8String)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, UTF8String)],
      input: InternalRow): mutable.PriorityQueue[(Double, UTF8String)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null && !java.lang.Double.isNaN(s.asInstanceOf[Double])) {
      // clone(): the evaluated UTF8String may point into a reused
      // UnsafeRow buffer — storing it un-copied corrupts the heap.
      insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[UTF8String].clone()))
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, UTF8String)],
      other: mutable.PriorityQueue[(Double, UTF8String)]): mutable.PriorityQueue[(Double, UTF8String)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, UTF8String)]): Any = {
    // Sorted COPY — eval must not mutate the buffer (see TopKAgg.eval).
    val best = buf.toArray.sortWith(worstFirst.lt)
    new GenericArrayData(
      best.map { case (s, d) => new GenericInternalRow(Array[Any](d, s)): Any })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, UTF8String)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(8 + 32 * buf.size)
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) =>
      out.writeDouble(s)
      val b = i.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.PriorityQueue[(Double, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.enqueue((s, UTF8String.fromBytes(b)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStrAgg =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "graft_top_k_str"
}

object TopKAgg {
  val resultType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  val strResultType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  /** Aggregate Column: top `k` (id, score) pairs by (score desc, id
    * asc), best-first. `score` must be DoubleType, `id` LongType
    * (cast at the call site).
    */
  def topK(score: Column, id: Column, k: Int): Column =
    column(TopKAgg(expression(score), expression(id), k).toAggregateExpression())

  /** [[topK]] with STRING ids (categories, tokens). */
  def topKStr(score: Column, id: Column, k: Int): Column =
    column(TopKStrAgg(expression(score), expression(id), k).toAggregateExpression())
}
