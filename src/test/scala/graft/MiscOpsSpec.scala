package graft

import org.apache.spark.sql.functions._

/** Coverage stragglers: approx distinct tolerance (A3 — sketch-incompatible
  * with DuckDB, so no oracle), right/full outer joins (J3 beyond the q04
  * left-outer probe).
  */
class MiscOpsSpec extends SparkSpec {

  test("A3: approx_count_distinct within 5% of exact on events.user_id") {
    val ev = Tables.events(spark, sf001)
    val exact = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
    val approx = ev.agg(approx_count_distinct(col("user_id"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("J3: right and full outer joins keep unmatched sides") {
    import spark.implicits._
    val a = Seq((1, "a1"), (2, "a2")).toDF("k", "av")
    val b = Seq((2, "b2"), (3, "b3")).toDF("k2", "bv")
    val right = a.join(b, col("k") === col("k2"), "right_outer")
      .select(col("k2"), col("av")).orderBy("k2").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(right == Seq((2, "a2"), (3, null)))
    val full = a.join(b, col("k") === col("k2"), "full_outer")
      .select(coalesce(col("k"), col("k2")).as("kk")).orderBy("kk")
      .as[Int].collect().toSeq
    assert(full == Seq(1, 2, 3))
  }
}
