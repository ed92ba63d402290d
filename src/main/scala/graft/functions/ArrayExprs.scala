package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** |a ∩ b| over two string arrays, without materializing the
  * intersection.
  *
  * Why a custom Expression: `size(array_intersect(a, b))` builds the
  * intersected array per pair only to count it, and on a Jaccard pair
  * scan the expression appears in both the similarity and the threshold
  * filter — Catalyst duplicates it after predicate pushdown, so the
  * intersection was computed (and allocated) twice per pair. This is a
  * single hash-set probe, O(|a|+|b|), no allocation beyond the set.
  *
  * Duplicate elements count once (set semantics — inputs are expected
  * to be distinct token/shingle sets); null elements are ignored.
  */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"intersect_size needs array<string> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    // Probe the smaller side's set with the larger side.
    val (small, big) =
      if (aa.numElements() <= bb.numElements()) (aa, bb) else (bb, aa)
    val set = new java.util.HashSet[UTF8String](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) {
      if (!small.isNullAt(i)) set.add(small.getUTF8String(i))
      i += 1
    }
    var n = 0
    var j = 0
    while (j < big.numElements()) {
      if (!big.isNullAt(j) && set.remove(big.getUTF8String(j))) n += 1
      j += 1
    }
    n
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSize =
    copy(left = newLeft, right = newRight)
}

/** |a ∩ b| for two string arrays that are ALREADY sorted ascending and
  * distinct: a single merge walk, no hash set, no per-pair allocation.
  * On a pair scan the per-row sort happens once per document (in the
  * projection feeding the join), while the merge runs per pair — the
  * right place to spend the work. Results are undefined if inputs are
  * unsorted (callers own the contract).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size needs array<string> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (na, nb) = (aa.numElements(), bb.numElements())
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = aa.getUTF8String(i)
      val y = bb.getUTF8String(j)
      val c = x.compareTo(y)
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object ArrayExprs {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** `intersect_size(a, b)` as a Column. */
  def intersectSize(a: Column, b: Column): Column =
    column(IntersectSize(expression(a), expression(b)))

  /** `sorted_intersect_size(a, b)` — inputs must be sorted + distinct. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    column(SortedIntersectSize(expression(a), expression(b)))
}
