package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused md5-prefix hash kernels (r19 optimization round).
  *
  * The engine's portable hashing discipline is
  * `conv(substring(md5(x), 1, D), 16, 10).cast("long")` — identical in
  * Spark and DuckDB, so every minhash signature, shingle digest, sample
  * hash and sampled-model rank is oracle-checkable. The COST of that
  * spelling is four chained allocating expressions per evaluation: the
  * 32-char hex string from `Md5`, the D-char `substring` copy, `conv`'s
  * hex parse into a decimal STRING, and the final long cast's parse. On
  * the minhash hot path (numHashes + 1 evaluations per shingle, shingles
  * ≈ tokens per document) the hex round-trips dominate the signature
  * pass.
  *
  * These expressions compute the SAME value straight from the digest
  * bytes — the first D hex digits of md5 are the first 4·D bits of the
  * digest, read big-endian — with one thread-local MessageDigest and no
  * intermediate strings. Bit-for-bit equal to the conv spelling (the
  * [[graft.operators.Embeddings]] driver-side `md5Long60` precedent,
  * promoted to a whole-stage-codegen Catalyst expression), so the DuckDB
  * oracle twins are untouched. The seeded form additionally fuses the
  * `concat(seed.cast("string"), "|", s)` allocation the signature loop
  * paid per (seed, shingle) pair.
  */
object HashKernels {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First `digits` hex chars of the digest as a non-negative long
    * (digits ≤ 15 ⇒ ≤ 60 bits).
    */
  def prefix(d: Array[Byte], digits: Int): Long = {
    var v = 0L
    var i = 0
    val full = digits >> 1
    while (i < full) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    if ((digits & 1) == 1) v = (v << 4) | ((d(full) & 0xffL) >>> 4)
    v
  }

  def md5Prefix(s: UTF8String, digits: Int): Long = {
    val m = md.get()
    m.reset()
    prefix(m.digest(s.getBytes), digits)
  }

  /** md5 of `<seed-as-decimal-string>|<s>` — byte-identical input to
    * `md5(concat(seed.cast("string"), lit("|"), s))`.
    */
  def md5SeedPrefix(seed: Int, s: UTF8String, digits: Int): Long = {
    val m = md.get()
    m.reset()
    m.update(java.lang.Integer.toString(seed)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    m.update('|'.toByte)
    m.update(s.getBytes)
    prefix(m.digest(), digits)
  }
}

/** `conv(substring(md5(child), 1, digits), 16, 10).cast("long")` as one
  * fused, codegen'd expression. Null child → null, like the chain.
  */
case class Md5PrefixLongExpr(child: Expression, digits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(digits >= 1 && digits <= 15,
    s"digits must be in [1, 15] to fit a long, got $digits")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix"

  protected override def nullSafeEval(s: Any): Any =
    HashKernels.md5Prefix(s.asInstanceOf[UTF8String], digits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.HashKernels.md5Prefix($c, $digits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `conv(substring(md5(concat(seed.cast("string"), "|", s)), 1, digits),
  * 16, 10).cast("long")` as one fused, codegen'd expression — the minhash
  * signature loop's per-(seed, shingle) hash without the concat or hex
  * round-trips. Null on either null input, like the chain (a null
  * operand nulls the concat, and md5(null) is null).
  */
case class Md5SeedPrefixLongExpr(left: Expression, right: Expression,
    digits: Int) extends BinaryExpression with ExpectsInputTypes {
  require(digits >= 1 && digits <= 15,
    s"digits must be in [1, 15] to fit a long, got $digits")
  override def inputTypes: Seq[AbstractDataType] = Seq(IntegerType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_seed_prefix"

  protected override def nullSafeEval(seed: Any, s: Any): Any =
    HashKernels.md5SeedPrefix(seed.asInstanceOf[Int],
      s.asInstanceOf[UTF8String], digits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.HashKernels.md5SeedPrefix($a, $b, $digits)")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** Column ⇄ Expression bridge (same pattern as [[VectorColumns]]). */
object HashColumns {
  private def toCol(e: Expression): Column = ExpressionUtils.column(e)
  private def ex(c: Column): Expression = ExpressionUtils.expression(c)
  def md5PrefixLong(c: Column, digits: Int = 15): Column =
    toCol(Md5PrefixLongExpr(ex(c), digits))
  def md5SeedPrefixLong(seed: Column, s: Column, digits: Int = 15): Column =
    toCol(Md5SeedPrefixLongExpr(ex(seed), ex(s), digits))
}
