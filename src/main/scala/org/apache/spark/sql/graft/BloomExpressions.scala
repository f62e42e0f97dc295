package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column bridge to Spark's OWN bloom-filter expressions (the machinery
  * behind `spark.sql.optimizer.runtime.bloomFilter.*` runtime filters,
  * catalyst's BloomFilterAggregate / BloomFilterMightContain) — exposed
  * for EXPLICIT semi-join reduction where the optimizer's injected filter
  * cannot reach (e.g. the filter side is computed, or the plan shape
  * hides the join from InjectRuntimeFilter). Same codegen'd xxhash64 +
  * might_contain path the built-in uses; this package exists because
  * ExpressionUtils is private[sql].
  */
object BloomFunctions {
  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ExpressionUtils.column(e)
  private def ex(c: Column) = ExpressionUtils.expression(c)

  /** 64-bit hash column matching the bloom's key space (seed 42, the
    * XxHash64 default — MUST be the same on build and probe side).
    */
  def keyHash(c: Column): Column = toCol(new XxHash64(Seq(ex(c))))

  /** Aggregate a bloom filter over a LongType hash column (use [[keyHash]])
    * into one binary sketch value.
    */
  def bloomAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    toCol(new BloomFilterAggregate(ex(hashed),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of a driver-inlined bloom sketch (catalyst requires
    * the bloom side foldable): false positives possible, false negatives
    * never — the semi-join-reduction contract.
    */
  def mightContain(bloomBytes: Array[Byte], hashed: Column): Column =
    toCol(BloomFilterMightContain(Literal(bloomBytes), ex(hashed)))
}
