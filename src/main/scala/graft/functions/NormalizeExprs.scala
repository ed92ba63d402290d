package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static Unicode-normalization kernels — called from both interpreted
  * eval and generated code (same pattern as [[WordShingleOps]]; a Scala
  * UDF here would break whole-stage codegen under every curation scan).
  */
object NormalizeOps {
  def nfc(input: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(
        input.toString, java.text.Normalizer.Form.NFC))

  /** NFD-decompose then drop combining marks (the portable
    * `strip_accents` definition DuckDB implements).
    */
  def stripAccents(input: UTF8String): UTF8String = {
    val d = java.text.Normalizer.normalize(
      input.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (java.lang.Character.getType(c) != java.lang.Character.NON_SPACING_MARK)
        sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Shannon entropy in bits over Unicode code points. The exact
    * `log2(n) - sum(c*log2(c))/n` form needs one log per DISTINCT
    * character; terms are accumulated in ascending code-point order so
    * the float summation order is fixed (callers still round before
    * cross-engine comparison — a different engine sums in its own
    * order).
    */
  def charEntropy(input: UTF8String): Double = {
    val s = input.toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += java.lang.Character.charCount(cp)
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      acc += c * (math.log(c) / math.log(2.0))
    }
    math.log(n.toDouble) / math.log(2.0) - acc / n
  }
}

private[graft] trait StringKernelExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.simpleString}")
}

/** Unicode NFC normalization (compose combining sequences) — the
  * canonical-form step every dedup/fingerprint pipeline needs before
  * hashing, or visually-identical documents hash apart.
  */
case class NfcNormalize(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    NormalizeOps.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeOps.nfc($c);")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** NFD-decompose + drop combining marks (portable strip_accents). */
case class StripAccents(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    NormalizeOps.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeOps.stripAccents($c);")
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

/** Per-document character-level Shannon entropy (bits) — a cheap
  * quality signal: machine-generated or binary-ish junk sits far from
  * natural-language entropy bands. One flat pass per document.
  */
case class CharEntropy(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    NormalizeOps.charEntropy(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeOps.charEntropy($c);")
  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object NormalizeExprs {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
  def nfc(c: Column): Column = column(NfcNormalize(expression(c)))
  def stripAccents(c: Column): Column = column(StripAccents(expression(c)))
  def charEntropy(c: Column): Column = column(CharEntropy(expression(c)))
}
