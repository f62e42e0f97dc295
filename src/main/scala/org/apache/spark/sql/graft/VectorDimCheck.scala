package org.apache.spark.sql.graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.ArrayType

/** Analysis-time vector-dimension check (SURVEY.md §4.3 stretch item): when
  * BOTH sides of a graft vector expression have a statically known length
  * (array literals / foldable CreateArray) and the lengths differ, fail the
  * query at analysis instead of silently returning NULL per row at runtime.
  * The engine's pgvector-parity dim enforcement (index_documents.py:181-185)
  * is runtime-side in the embed operator; this rule is the compile-time
  * complement for hand-written queries.
  *
  * Installed via `graft.plans.GraftExtensions` (injectCheckRule) or
  * programmatically with `GraftFunctions.register`.
  */
object VectorDimCheck extends (LogicalPlan => Unit) {

  private def staticLen(e: Expression): Option[Int] = e match {
    case CreateArray(children, _) => Some(children.length)
    case Literal(a: ArrayData, ArrayType(_, _)) => Some(a.numElements())
    case _ => None
  }

  private def check(l: Expression, r: Expression, name: String): Unit =
    for (nl <- staticLen(l); nr <- staticLen(r) if nl != nr)
      throw new AnalysisException("INTERNAL_ERROR", Map("message" ->
        s"$name: vector dimension mismatch: left has $nl elements, right has $nr"))

  def apply(plan: LogicalPlan): Unit =
    plan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case e: DotProductExpr        => check(e.left, e.right, e.prettyName)
        case e: CosineSimilarityExpr  => check(e.left, e.right, e.prettyName)
        case e: L2DistanceExpr        => check(e.left, e.right, e.prettyName)
        case _ =>
      })
    }
}
