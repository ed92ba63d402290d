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

  /** Repair double-encoded UTF-8 ("mojibake": UTF-8 bytes read back as
    * Latin-1, the classic `cafÃ©`). The reinterpretation (re-encode as
    * Latin-1, re-decode as UTF-8) is applied ONLY when it is provably
    * lossless: every char fits Latin-1 AND the resulting bytes decode
    * as strict UTF-8. Pure ASCII round-trips to itself; genuine
    * accented text (e.g. a real `é`) fails strict UTF-8 decode and is
    * left untouched — the guard makes the fix idempotent and safe to
    * run corpus-wide.
    */
  def fixMojibake(input: UTF8String): UTF8String = {
    val s = input.toString
    // fast path: nothing above ASCII -> nothing to reinterpret
    var i = 0
    var hasHigh = false
    while (i < s.length && !hasHigh) {
      if (s.charAt(i) >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return input
    // chars beyond Latin-1 cannot be a Latin-1 misread; leave as-is
    i = 0
    while (i < s.length) {
      if (s.charAt(i) > 0xFF) return input
      i += 1
    }
    val bytes = new Array[Byte](s.length)
    i = 0
    while (i < s.length) { bytes(i) = s.charAt(i).toByte; i += 1 }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try UTF8String.fromString(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => input }
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

/** Guarded repair of Latin-1-misread UTF-8 (see
  * [[NormalizeOps.fixMojibake]]) — run before hashing/dedup or the
  * same document in clean and mojibake forms dedups apart.
  */
case class FixMojibake(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    NormalizeOps.fixMojibake(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeOps.fixMojibake($c);")
  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
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
  def fixMojibake(c: Column): Column = column(FixMojibake(expression(c)))
}
