package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CosineSimilarityExpr, DotProductExpr, L2DistanceExpr, VectorColumns}

/** Registration for the custom vector expressions.
  *
  * Two entry points:
  *   - [[GraftFunctions.register]] — programmatic, per-session (used by the
  *     library itself and the test/bench harnesses);
  *   - [[GraftExtensions]] — `spark.sql.extensions=graft.plans.GraftExtensions`
  *     for cluster-wide installation via SparkSessionExtensions.
  *
  * Also exposes Column builders that construct the expressions directly
  * (no registry needed) for the DataFrame API path.
  */
object GraftFunctions {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[CosineSimilarityExpr].getName, name)

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => DotProductExpr(es(0), es(1))),
    "graft_cosine" -> (es => CosineSimilarityExpr(es(0), es(1))),
    "graft_l2" -> (es => L2DistanceExpr(es(0), es(1))))

  /** Idempotent per-session SQL-function registration. */
  def register(spark: SparkSession): Unit = builders.foreach { case (name, b) =>
    spark.sessionState.functionRegistry.registerFunction(FunctionIdentifier(name), info(name), b)
  }

  // --- direct Column builders (DataFrame API, no registration required)

  def dotFast(a: Column, b: Column): Column = VectorColumns.dotFast(a, b)
  def cosineFast(a: Column, b: Column): Column = VectorColumns.cosineFast(a, b)
  def l2Fast(a: Column, b: Column): Column = VectorColumns.l2Fast(a, b)
}

/** `--conf spark.sql.extensions=graft.plans.GraftExtensions` — installs the
  * SQL functions, the analysis-time vector-dimension check rule
  * (org.apache.spark.sql.graft.VectorDimCheck), and the optimizer rewrite
  * that swaps naive HOF dot-product trees for the fused codegen'd kernel
  * (org.apache.spark.sql.graft.VectorHofRewrite).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[CosineSimilarityExpr].getName, name), b))
    }
    ext.injectCheckRule(_ => org.apache.spark.sql.graft.VectorDimCheck)
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.VectorHofRewrite)
  }
}
