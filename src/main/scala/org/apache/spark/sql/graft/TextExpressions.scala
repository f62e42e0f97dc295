package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd expression — Spark has no
  * built-in for it, and tokenizer preprocessing needs NFKC (ligatures
  * split, full-width forms folded) while exact-dedup canonicalization
  * needs NFC (combining sequences composed). A JVM `java.text.Normalizer`
  * static call inside whole-stage codegen beats a Scala UDF (no
  * serialization, no codegen fence).
  *
  * `form` is validated at construction (NFC/NFD/NFKC/NFKD) so an invalid
  * form fails at plan time, not per row.
  */
case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {
  // fail fast on bad form names — also guarantees codegen interpolation
  // below only ever sees a valid enum constant
  java.text.Normalizer.Form.valueOf(form)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpr =
    copy(child = newChild)
}

/** Kernels shared by interpreted eval and generated code. */
object TextKernels {
  /** Mojibake repair: re-encode the (necessarily Latin-1-range) chars as
    * bytes, strictly re-decode as UTF-8. Returns the input unchanged when
    * any char exceeds 0xFF (healthy multibyte text), when the strict
    * decode fails (legitimate Latin-1-range text), or when the result
    * does not shrink (real double-encoding always shrinks).
    */
  def fixMojibake(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val bytes = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c > 0xFF) return s
      bytes(i) = c.toByte
      i += 1
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out.length < n) UTF8String.fromString(out) else s
    } catch { case _: java.nio.charset.CharacterCodingException => s }
  }
}

/** Mojibake repair as a native expression (Spark 4's `decode` throws on
  * malformed bytes, so the engine built-ins cannot express the
  * try-and-fall-back semantics). See [[TextKernels.fixMojibake]].
  */
case class MojibakeFixExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"

  override def nullSafeEval(s: Any): Any =
    TextKernels.fixMojibake(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TextKernels$$.MODULE$$.fixMojibake($c)")

  override protected def withNewChildInternal(newChild: Expression): MojibakeFixExpr =
    copy(child = newChild)
}

/** Column bridge (ExpressionUtils is private[sql], hence this package). */
object TextColumns {
  def normalizeUnicode(c: Column, form: String): Column =
    ExpressionUtils.column(UnicodeNormalizeExpr(ExpressionUtils.expression(c), form))
  def fixMojibake(c: Column): Column =
    ExpressionUtils.column(MojibakeFixExpr(ExpressionUtils.expression(c)))
}
