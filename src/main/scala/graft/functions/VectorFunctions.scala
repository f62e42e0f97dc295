package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` columns using Spark's
  * higher-order functions only — fully codegen'd, no UDFs (SURVEY.md §2.9).
  *
  * These implement the query surface the reference delegates to pgvector
  * (`README.md:83-91`): cosine (`<=>`), L2 (`<->`) and inner product (`<#>`).
  *
  * All accumulation is done in Double, left-to-right over the array, which is
  * deterministic and matches DuckDB's list_* kernels after a `::DOUBLE[]`
  * cast — required for ROUND()-stable oracle comparison.
  */
object VectorFunctions {

  /** Cast array<float> -> array<double> so products/sums are double-precision. */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** L2-normalize to unit length (zero vector left unchanged). */
  def normalize(a: Column): Column = {
    val n = norm2(a)
    when(n === 0.0, toDouble(a)).otherwise(transform(toDouble(a), x => x / n))
  }
}
