package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** The pinned loader-level schemas of the 10 driver-generated fixture tables
  * (TESTDATA.md), shared by FixtureShapeSpec (fails `sbt test`) and by
  * [[Verify]] (fails the correctness gate itself). The round-8 regression
  * class motivates having the gate too: a fixture regeneration between test
  * runs and the driver's Verify invocation would otherwise surface as N
  * silently-wrong probes instead of one loud "fixture regenerated?" refusal.
  *
  * `null` as an expected type means "any timestamp type" — fixture
  * regenerations legitimately flip tz'd/NTZ and precision there; the events
  * loader normalizes `ts` to TimestampType itself (Tables.eventsFromPath).
  */
object FixtureShapes {

  val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> null,
      "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> null),
    "events" -> Seq("event_id" -> LongType,
      "ts" -> TimestampType, // loader-normalized, whatever the footer said
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  def isTimestampLike(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  /** Compare every fixture table under `dir` (opened through its loader)
    * against the pinned shape. Returns one human-readable diagnostic per
    * drifted table — empty means all pinned. A table whose loader THROWS
    * (missing path, footer the loader refuses) is reported as drift too,
    * not propagated: the caller's job is to print the full list and refuse.
    */
  def drift(spark: SparkSession, dir: String): Seq[String] =
    Tables.all.flatMap { name =>
      try {
        val df = name match {
          case "events" => Tables.events(spark, dir)
          case other    => Tables.load(spark, dir, other)
        }
        val actual = df.schema.fields.map(f => f.name -> f.dataType).toSeq
        val exp = expected(name)
        if (actual.map(_._1) != exp.map(_._1))
          Seq(s"$name: column names drifted — expected ${exp.map(_._1).mkString(",")}, " +
            s"got ${actual.map(_._1).mkString(",")}")
        else exp.zip(actual).flatMap { case ((colName, expDt), (_, actDt)) =>
          if (expDt == null) {
            if (isTimestampLike(actDt)) None
            else Some(s"$name.$colName: expected a timestamp type, got $actDt")
          } else if (actDt != expDt)
            Some(s"$name.$colName: expected $expDt, got $actDt")
          else None
        }
      } catch {
        case e: Exception =>
          Seq(s"$name: loader failed — ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(2).mkString(" "))
      }
    }
}
