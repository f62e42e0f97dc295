package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.{aggregate, element_at, lit, zip_with}
import org.apache.spark.sql.graft.{CosineSimilarityExpr, DotProductExpr, L2DistanceExpr, NearestCentroidExpr, VectorColumns}
import org.apache.spark.sql.types.{DoubleType, IntegerType}

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

  /** The complete graft_* SQL surface (VERDICT r12 item 8). The first
    * four are the native codegen'd expressions; the last two register
    * COMPOSED built-in trees (macro-expanded at resolution — same plan a
    * DataFrame caller of VectorFunctions.normalize / Search.pqAdcScoreCol
    * gets, so the SQL spelling can express the engine's funnels without
    * DataFrame help).
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => DotProductExpr(es(0), es(1))),
    "graft_cosine" -> (es => CosineSimilarityExpr(es(0), es(1))),
    "graft_l2" -> (es => L2DistanceExpr(es(0), es(1))),
    // 0-based index of the nearest centroid (cosine, ties -> lowest):
    // graft_nearest_centroid(vec, array(array<float>...))
    "graft_nearest_centroid" -> (es => NearestCentroidExpr(es(0), es(1))),
    // L2-normalize to unit length (zero vector unchanged, as double[])
    "graft_normalize" -> (es => normalizeExpr(es(0))),
    // ADC table-sum: graft_adc_sum(codes array<int>, tables
    // array<array<double>>) = SUM_s tables[s][codes[s]+1] — the PQ scan
    // kernel (Search.pqAdcScoreCol) with the per-query tables passed as a
    // column/literal instead of baked-in literals
    "graft_adc_sum" -> (es => adcSumExpr(es(0), es(1))))

  // The composed builders construct CATALYST trees directly (the same
  // nodes the SQL parser yields for the equivalent HOF spelling, with
  // unresolved lambda variables the analyzer resolves) — a Column tree
  // unwrapped into a registered function stays an Unevaluable
  // ColumnNodeExpression in SQL-land and dies at codegen.

  private def lv(n: String) = UnresolvedNamedLambdaVariable(Seq(n))

  private def toDoubleArr(e: Expression): Expression = {
    val x = lv("x")
    ArrayTransform(e, LambdaFunction(Cast(x, DoubleType), Seq(x)))
  }

  /** aggregate(zip_with(toD(e), toD(e), *), 0.0, +) — ‖e‖² in doubles,
    * the VectorFunctions.dotHof(a, a) tree.
    */
  private def dotSelf(e: Expression): Expression = {
    val x = lv("x"); val y = lv("y")
    val prod = ZipWith(toDoubleArr(e), toDoubleArr(e),
      LambdaFunction(Multiply(x, y), Seq(x, y)))
    val acc = lv("acc"); val v = lv("v"); val r = lv("r")
    ArrayAggregate(prod, Literal(0.0),
      LambdaFunction(Add(acc, v), Seq(acc, v)), LambdaFunction(r, Seq(r)))
  }

  /** The VectorFunctions.normalize tree (unit length; zero vector
    * unchanged, as double[]) over a raw expression.
    */
  def normalizeExpr(a: Expression): Expression = {
    val n = Sqrt(dotSelf(a))
    val x = lv("x")
    CaseWhen(Seq((EqualTo(n, Literal(0.0)), toDoubleArr(a))),
      Some(ArrayTransform(toDoubleArr(a),
        LambdaFunction(Divide(x, n), Seq(x)))))
  }

  /** Σ_s tables(s)(codes(s)+1), 0-based codes over 1-based SQL arrays. */
  def adcSumExpr(codes: Expression, tables: Expression): Expression = {
    val c = lv("c"); val t = lv("t")
    val picked = ZipWith(codes, tables,
      LambdaFunction(ElementAt(t, Add(Cast(c, IntegerType), Literal(1))), Seq(c, t)))
    val acc = lv("acc"); val x = lv("x"); val r = lv("r")
    ArrayAggregate(picked, Literal(0.0),
      LambdaFunction(Add(acc, x), Seq(acc, x)), LambdaFunction(r, Seq(r)))
  }

  /** Σ_s tables(s)(codes(s)+1) as a Column (DataFrame spelling of
    * [[adcSumExpr]]; the spec pins the two equal).
    */
  def adcSum(codes: Column, tables: Column): Column =
    aggregate(
      zip_with(codes, tables, (c, t) => element_at(t, c.cast("int") + 1)),
      lit(0.0), (acc, x) => acc + x)

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
