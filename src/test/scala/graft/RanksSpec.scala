package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ranks

/** Scale-safe ranking (Ranks): exact equivalence with the built-in global
  * window forms, and the plan guarantee the operator exists for — no
  * partition-less WindowExec anywhere in the executed plan.
  */
class RanksSpec extends SparkSpec {

  private def randomDf(n: Int, seed: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong, rnd.nextInt(40).toDouble)).toDF("id", "v")
      .repartition(7) // scatter input so ranking has real work to do
  }

  test("globalRank ≡ row_number over a global window (unique key order)") {
    import spark.implicits._
    val df = randomDf(500, seed = 1L)
    val ranked = Ranks.globalRank(df, Seq(col("v"), col("id")), "r")
    val got = ranked.select("id", "r").as[(Long, Long)].collect().toMap
    val want = df.withColumn("r",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("globalRank plan: the range exchange is physically REUSED by both consumers") {
    // correctness depends on one shared exchange — if reuse ever stops
    // firing (config or optimizer change), _pid assignments can diverge
    // between the ranking and offsets branches and ranks silently corrupt;
    // this assertion turns that into a loud failure
    val ranked = Ranks.globalRank(randomDf(300, seed = 7L), Seq(col("v"), col("id")), "r")
    ranked.collect() // execute THIS frame so its AQE plan is finalized
    val plan = ranked.queryExecution.executedPlan.toString
    // non-AQE: ReusedExchange; AQE: the second consumer reads a ReusedQueryStage
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage")
        || plan.contains("(reuses"),
      s"range exchange not reused in:\n$plan")
    // and the disabled-reuse case fails loudly instead of corrupting
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try intercept[IllegalArgumentException](
      Ranks.globalRank(randomDf(10, seed = 8L), Seq(col("id")), "r"))
    finally spark.conf.set("spark.sql.exchange.reuse", "true")
  }

  test("ntileExact ≡ built-in ntile for n dividing, not dividing, and exceeding N") {
    import spark.implicits._
    for ((rows, n) <- Seq((120, 4), (121, 4), (7, 10), (123, 7))) {
      val df = randomDf(rows, seed = rows)
      val got = Ranks.ntileExact(df, n, Seq(col("v"), col("id")), "t")
        .select("id", "t").as[(Long, Int)].collect().toMap
      val want = df.withColumn("t", ntile(n).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "t").as[(Long, Int)].collect().toMap
      assert(got == want, s"mismatch at rows=$rows n=$n")
    }
  }

  test("ntileExact plan: data-ranking window is partitioned; partition-less windows only over aggregates") {
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.window.WindowExec
    // inspect BEFORE execution: AQE stage wrappers hide executed subtrees
    // from collect(), which would make the assertions vacuous
    val tiles = Ranks.ntileExact(
      Tables.events(spark, sf001).where(col("user_id") < 50),
      4, Seq(col("value"), col("event_id")), "quartile")
    val plan = tiles.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, plan.toString.take(1500))
    assert(windows.exists(_.partitionSpec.nonEmpty), plan.toString.take(1500))
    // any partition-less window must sit over an aggregate (the P-row
    // offset cumsum), never over the raw data — that's the single-task funnel
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val overAggregate = w.child.collectFirst {
        case h: HashAggregateExec => h
        case h: ObjectHashAggregateExec => h
        case h: SortAggregateExec => h
      }.isDefined
      assert(overAggregate, s"partition-less window over raw data:\n${w.toString.take(1200)}")
    }
  }
}
