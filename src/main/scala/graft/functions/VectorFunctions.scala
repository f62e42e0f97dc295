package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorColumns

/** Vector math over `array<float>` columns.
  *
  * These implement the query surface the reference delegates to pgvector
  * (`/root/reference/README.md:83-91`): cosine (`<=>` is 1−this), L2 (`<->`)
  * and inner product (`<#>`).
  *
  * The default entry points delegate to the custom codegen'd Catalyst
  * expressions (org.apache.spark.sql.graft.VectorExpressions): one fused
  * loop per row-pair, no intermediate array allocation — the O(N²) near-dup
  * hot path runs ~3× faster than the higher-order-function formulation.
  * The `*Hof` variants keep the pure-built-in formulation; both accumulate
  * left-to-right in Double and are bit-identical (equivalence-tested), so
  * either form hash-matches the DuckDB oracle.
  *
  * Semantics notes (ADVICE r1): cosine of a zero-norm vector is NULL (both
  * forms — non-ANSI division by zero; pgvector's `<=>` yields NaN there);
  * length-mismatched inputs yield NULL rather than erroring.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column = VectorColumns.dotFast(a, b)
  def cosine(a: Column, b: Column): Column = VectorColumns.cosineFast(a, b)
  def l2Distance(a: Column, b: Column): Column = VectorColumns.l2Fast(a, b)

  /** pgvector `<=>` is cosine *distance*. */
  def cosineDistance(a: Column, b: Column): Column = lit(1.0) - cosine(a, b)

  // ---- pure higher-order-function reference forms (no custom expressions)

  /** Cast array<float> -> array<double> so products/sums are double-precision. */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dotHof(a, a))

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (norm2(a) * norm2(b))

  def l2DistanceHof(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** L2-normalize to unit length (zero vector left unchanged). */
  def normalize(a: Column): Column = {
    val n = norm2(a)
    when(n === 0.0, toDouble(a)).otherwise(transform(toDouble(a), x => x / n))
  }
}
