package graft

import org.apache.spark.sql.types._

/** Fixture-shape guard (round-8 regression class). Round 8 broke because the
  * events loader hardcoded a TIMESTAMP(NANOS) workaround after the driver
  * regenerated `events.parquet` as TIMESTAMP(MICROS): 9 probes went silently
  * wrong (30 days of events compressed into ~43 minutes of 1970). These
  * specs make the next fixture regeneration fail LOUDLY at the first test:
  *
  *  - every fixture table must open through its loader with the column
  *    names/types the queries assume;
  *  - the precision-aware events helper must read a micros-typed and a
  *    nanos-typed file to identical values (both code paths exercised
  *    regardless of what the current fixture happens to be);
  *  - events absolute time must be modern — an absolute-year assertion
  *    catches any future unit error (the r8 bug made every year 1970).
  */
class FixtureShapeSpec extends SparkSpec {

  // pinned shapes live in main ([[FixtureShapes]]) since round 10, so the
  // correctness gate (Verify) refuses on drift too, not just `sbt test`
  private val expectedSchemas = FixtureShapes.expected

  private def isTimestampLike(dt: DataType): Boolean =
    FixtureShapes.isTimestampLike(dt)

  test("every fixture table opens through its loader with the assumed schema") {
    // both the spec-default scale AND the driver's correctness-gate scale:
    // a regeneration that drifts only one of them must still fail here
    for (dir <- Seq(sf001, "/root/testdata/sf0.01"); name <- Tables.all) {
      val df = name match {
        case "events" => Tables.events(spark, dir)
        case other    => Tables.load(spark, dir, other)
      }
      val actual = df.schema.fields.map(f => f.name -> f.dataType).toSeq
      val expected = expectedSchemas(name)
      assert(actual.map(_._1) == expected.map(_._1),
        s"$name column names drifted: got ${actual.map(_._1)}")
      for (((col, expDt), (_, actDt)) <- expected.zip(actual)) {
        if (expDt == null)
          assert(isTimestampLike(actDt), s"$name.$col expected a timestamp type, got $actDt")
        else
          assert(actDt == expDt, s"$name.$col expected $expDt, got $actDt")
      }
      assert(df.limit(1).count() == 1, s"$name fixture is empty")
    }
  }

  test("events absolute time is modern (unit errors land in 1970)") {
    import org.apache.spark.sql.functions._
    val yrs = Tables.events(spark, sf001)
      .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi")).head()
    assert(yrs.getInt(0) >= 2000, s"events min year ${yrs.getInt(0)} — timestamp unit bug?")
    assert(yrs.getInt(1) <= 2100, s"events max year ${yrs.getInt(1)} — timestamp unit bug?")
  }

  test("precision-aware events helper: micros and nanos fixtures read to identical values") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("evprec")
    // known instants, not multiples of 512 ns, to catch double-division drift
    val microsVals = Seq(1704067200000001L, 1706745599999999L, 1705000000123457L)

    // micros fixture: written by Spark itself (TIMESTAMP(MICROS) footer)
    val microsPath = tmp.resolve("micros.parquet").toString
    spark.range(3).toDF("i")
      .select(
        col("i").as("event_id"),
        expr(s"timestamp_micros(element_at(array(${microsVals.mkString(",")}), cast(i+1 as int)))").as("ts"),
        col("i").as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(microsPath)

    // nanos fixture: parquet-hadoop example API (Spark cannot write NANOS)
    val nanosPath = tmp.resolve("nanos.parquet").toString
    writeNanosFixture(nanosPath, microsVals.map(_ * 1000L))

    assert(Tables.eventsTsPlan(spark, microsPath) == Tables.NativeTimestamp)
    assert(Tables.eventsTsPlan(spark, nanosPath) == Tables.NanosAsLong)

    def tsOf(path: String): Seq[Long] =
      Tables.eventsFromPath(spark, path)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect().map(_.getLong(1)).toSeq

    assert(tsOf(microsPath) == microsVals)
    assert(tsOf(nanosPath) == microsVals)

    // the streaming twin picks the same plan from the same footer
    for ((p, plan) <- Seq(microsPath -> Tables.NativeTimestamp, nanosPath -> Tables.NanosAsLong))
      assert(Tables.eventsTsPlan(spark, p) == plan)
  }

  test("Verify's tripwire flags a synthetic regenerated fixture and passes the real one") {
    import org.apache.spark.sql.functions._
    // real fixtures: no drift (this is what lets Verify run at all)
    assert(FixtureShapes.drift(spark, sf001).isEmpty)

    // synthetic regeneration: clone sf0.001 by symlink, then doctor events
    // to carry ts as STRING — the shape class the round-8 bug came from
    val dir = java.nio.file.Files.createTempDirectory("regen")
    val src = java.nio.file.Paths.get(sf001)
    for (t <- Tables.all if t != "events")
      java.nio.file.Files.createSymbolicLink(
        dir.resolve(s"$t.parquet"), src.resolve(s"$t.parquet"))
    spark.range(3).select(
        col("id").as("event_id"), lit("2024-01-01T00:00:00").as("ts"),
        col("id").as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)

    val drift = FixtureShapes.drift(spark, dir.toString)
    assert(drift.nonEmpty, "doctored events fixture must be flagged")
    assert(drift.forall(_.startsWith("events")), s"only events drifted, got: $drift")
    assert(drift.mkString.contains("refusing to guess"),
      "the strict events loader itself should refuse the unknown ts type")
  }

  /** Minimal TIMESTAMP(NANOS)-annotated parquet writer (the r7-era fixture
    * shape, which Spark 4.1.2 refuses to even schema-resolve).
    */
  private def writeNanosFixture(path: String, nanos: Seq[Long]): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    val schema: MessageType = Types.buildMessage()
      .optional(INT64).named("event_id")
      .optional(INT64)
      .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS)).named("ts")
      .optional(INT64).named("user_id")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .optional(DOUBLE).named("value")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val conf = new org.apache.hadoop.conf.Configuration()
    val writer = ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile
        .fromPath(new org.apache.hadoop.fs.Path(path), conf))
      .withType(schema).withConf(conf).build()
    val f = new SimpleGroupFactory(schema)
    try nanos.zipWithIndex.foreach { case (ns, i) =>
      val g = f.newGroup()
      g.add("event_id", i.toLong); g.add("ts", ns); g.add("user_id", i.toLong)
      g.add("event_type", "click"); g.add("value", 1.0); g.add("props", "{}")
      writer.write(g)
    } finally writer.close()
  }
}
