package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.DataType

/** The codegen-census liveness canary for REAL executor JVMs (VERDICT r18
  * item 1). The census's driver-side canary (CodegenCensusSpec) proves the
  * log capture is not blind in-process; this expression proves the
  * CROSS-PROCESS channel end-to-end: its codegen throws — triggering
  * Spark's own interpreted fallback and the pinned
  * "Expr codegen error and falling back to interpreter mode" warning —
  * only in a JVM launched with `-Dgraft.census.canary=throw`, which
  * [[graft.ClusterGate]] places on EXECUTOR JVMs alone. Used as a
  * `sortWithinPartitions` key: `SortExec.createSorter` builds its ordering
  * via `RowOrdering.create` INSIDE the task (under a live TaskContext), so
  * the generation attempt — and therefore the fallback signal — happens in
  * the executor process, never the driver. Interpreted evaluation is the
  * identity, so results stay correct through the degradation, exactly like
  * the real fallbacks the census exists to catch.
  */
case class CensusCanaryExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override protected def nullSafeEval(input: Any): Any = input
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (CensusCanary.armed) {
      throw new RuntimeException(
        "graft census canary: induced codegen failure (this JVM was " +
          "launched with -Dgraft.census.canary=throw); Spark must now fall " +
          "back to interpreted evaluation and log the pinned warning")
    }
    defineCodeGen(ctx, ev, c => c)
  }
  override protected def withNewChildInternal(newChild: Expression): CensusCanaryExpr =
    copy(child = newChild)
}

object CensusCanary {
  /** The system property arming the canary — a PROCESS-scoped flag, which
    * is the point: `spark.executor.extraJavaOptions` sets it on executor
    * JVMs only, so a signal proves executor-side codegen was observed.
    */
  val Prop = "graft.census.canary"

  def armed: Boolean = sys.props.get(Prop).contains("throw")

  /** The canary as a sort key (identity over its input). */
  def column(c: Column): Column =
    ExpressionUtils.column(CensusCanaryExpr(ExpressionUtils.expression(c)))
}
