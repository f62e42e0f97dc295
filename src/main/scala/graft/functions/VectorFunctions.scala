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

  // ---- int8 scalar quantization (EXT, 100 TB storage lever) ------------
  //
  // Symmetric per-vector quantization: scale = max|v|/127, code_i =
  // floor(v_i/scale + 0.5) ∈ [-127, 127]. Vectors shrink 4× (float32 →
  // int8 + one float scale), and cosine over codes needs NO dequantization:
  // the per-vector scales cancel, so the similarity is integer dot / integer
  // norms — exact integer arithmetic, engine-portable, oracle-checkable.
  // Rounding uses floor(x+0.5) (not round()) for cross-engine determinism.

  /** Per-vector quantization scale (max|v|/127; 0 for the zero vector). */
  def i8Scale(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double")))) / 127.0

  /** int8 code array for `v` (INT-typed for portable arithmetic; cast to
    * tinyint at the storage boundary). Zero vectors quantize to zeros.
    */
  def i8Codes(v: Column): Column = {
    val s = i8Scale(v)
    when(s === 0.0, transform(v, _ => lit(0)))
      .otherwise(transform(v, x => floor(x.cast("double") / s + 0.5).cast("int")))
  }

  /** Dequantized approximation (codes × scale). */
  def i8Dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** GLOBAL fixed-point codes: floor(x·127 + 0.5) — the same rounding rule
    * as [[i8Codes]] but with ONE shared scale instead of a per-vector one.
    * The per-vector scale is what makes i8 codes 1-byte-tight, but it
    * breaks linearity across vectors: code(a) − code(b) approximates
    * nothing, because a and b were scaled differently. The fixed global
    * scale keeps the map LINEAR, so integer code differences ARE scaled
    * vector differences — the property the residual IVF-PQ tier
    * ([[graft.operators.Search.writeIvfPqResidualIndex]]) needs for
    * `code(v) − code(centroid)` to be a faithful residual. Codes stay
    * integer-exact (engine-portable, oracle-checkable) at any realistic
    * embedding range: |x| ≤ 260 keeps every product below 2^53 in the
    * double-accumulated dots. DOUBLE-typed integers; cast at use sites.
    */
  def fpCodes(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 127.0 + 0.5))

  /** Driver-side twin of [[fpCodes]] (query vectors and centroids). */
  def fpCodesLocal(v: Seq[Float]): Array[Float] =
    v.map(x => math.floor(x.toDouble * 127.0 + 0.5).toFloat).toArray

  /** Exact-integer dot of two code arrays (long accumulator). */
  def i8Dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Cosine similarity computed entirely on int8 codes (scales cancel):
    * int dot / (√int-norm · √int-norm). Zero-code vectors → 0.0.
    */
  def i8Cosine(a: Column, b: Column): Column = {
    val na = i8Dot(a, a)
    val nb = i8Dot(b, b)
    when(na === 0L || nb === 0L, lit(0.0))
      .otherwise(i8Dot(a, b).cast("double") /
        (sqrt(na.cast("double")) * sqrt(nb.cast("double"))))
  }
}
