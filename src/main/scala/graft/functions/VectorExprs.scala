package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dense-vector dot product over `array<float>` /
  * `array<double>` columns.
  *
  * Why a custom Catalyst Expression: the composable alternative —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is a higher-order
  * function, which Spark evaluates interpreted, allocating per element;
  * on an ANN/near-dup pair scan that is the entire hot loop (measured
  * ~50× slower at 500×200 pairs × 64 dims). This expression compiles to
  * a tight primitive `for` loop inside whole-stage codegen.
  *
  * Semantics: elements are widened to double and accumulated
  * left-to-right (`acc += (double)a[i] * (double)b[i]`) — bit-identical
  * to DuckDB's `list_inner_product(CAST(a AS DOUBLE[]), ...)`, which the
  * correctness oracles rely on. Arrays of unequal length use the common
  * prefix; null elements are treated as 0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs array<float|double> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(aa.numElements(), bb.numElements())
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aa.isNullAt(i)) 0.0
        else if (lf) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (bb.isNullAt(i)) 0.0
        else if (rf) bb.getFloat(i).toDouble else bb.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, e: Expression) =
        if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $a.isNullAt($i) ? 0.0 : ${get(a, left)};
         |  double y = $b.isNullAt($i) ? 0.0 : ${get(b, right)};
         |  $acc += x * y;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** `dot_product(a, b)` as a Column (classic-mode Expression bridge —
    * Spark 4's unified Column API no longer exposes `.expr`).
    */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
}
