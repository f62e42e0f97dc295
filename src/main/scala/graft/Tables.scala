package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * All tables are plain parquet directories/files under a scale-factor dir
  * (`/root/testdata/sf0.01` etc). Parquet schemas are self-describing; no
  * schema inference is ever relied on (SURVEY.md §1.3).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** The events fixture's `ts` precision has changed under us across fixture
    * regenerations (TIMESTAMP(NANOS) through round 7, TIMESTAMP(MICROS) from
    * round 8), so the loader is precision-aware: it asks the footer first
    * ([[eventsTsPlan]]) and only applies the int64+`div 1000` workaround when
    * the footer actually says nanos. Both the batch path here and the
    * streaming path (Streams.streamTumblingToMemory) go through the same
    * helper so they can never disagree.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsFromPath(spark, s"$dir/events.parquet")

  /** How to read an events parquet file/dir, decided from its own footer. */
  private[graft] sealed trait EventsTsPlan
  private[graft] case object NativeTimestamp extends EventsTsPlan
  private[graft] case object NanosAsLong extends EventsTsPlan

  /** Physical shape for TIMESTAMP(NANOS)-era fixtures: Spark 4.1.2 rejects
    * the footer outright ([PARQUET_TYPE_ILLEGAL]), so `ts` is read as raw
    * int64 nanos and converted below.
    */
  private[graft] val eventsNanosRawSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  /** Probe the footer: if schema resolution succeeds and `ts` is a Spark
    * timestamp type, the file is self-describing (MICROS/MILLIS, tz'd or
    * NTZ). A TIMESTAMP(NANOS) footer fails resolution with
    * [PARQUET_TYPE_ILLEGAL] — that, or a raw un-annotated int64 `ts`,
    * selects the long fallback. Any OTHER resolvable `ts` type (string,
    * int32, …) is a regenerated-fixture shape this loader does not know,
    * and dividing it by 1000 would be a silent misread — fail loudly
    * instead. Any other error (missing path, corrupt footer) propagates.
    *
    * The plan is memoized per resolved path for the lifetime of the JVM:
    * probing re-reads the footer on the driver, and events-heavy probe
    * suites pay that constant per call otherwise (measured ~0.2–0.5 s per
    * probe in the r9 bench tail). Fixtures never change within a session.
    */
  private val tsPlanCache =
    new java.util.concurrent.ConcurrentHashMap[String, EventsTsPlan]()

  private[graft] def eventsTsPlan(spark: SparkSession, path: String): EventsTsPlan =
    tsPlanCache.computeIfAbsent(path, p => probeEventsTsPlan(spark, p))

  private def probeEventsTsPlan(spark: SparkSession, path: String): EventsTsPlan = {
    import org.apache.spark.sql.types._
    try {
      spark.read.parquet(path).schema.find(_.name == "ts").map(_.dataType) match {
        case Some(TimestampType) | Some(TimestampNTZType) => NativeTimestamp
        case Some(LongType)                               => NanosAsLong
        case other =>
          throw new IllegalStateException(
            s"events fixture at $path has ts of unsupported shape $other — " +
              "fixture regenerated? The loader only knows timestamp (native) " +
              "and int64-nanos footers; refusing to guess (a forced-schema " +
              "read of anything else would silently misparse).")
      }
    } catch {
      case e: Exception if e.getMessage != null &&
          e.getMessage.contains("PARQUET_TYPE_ILLEGAL") => NanosAsLong
    }
  }

  /** Precision-aware events read (batch). For native-timestamp footers the
    * self-described schema is used and `ts` is normalized to TimestampType
    * (session tz is UTC everywhere in this repo, so an NTZ cast is exact).
    * For nanos footers, `ts` is read as int64 and converted with INTEGER
    * division (`ts div 1000`): epoch-ns magnitudes (~1.7e18) exceed double's
    * 53-bit mantissa, so `col/1000L` (double division) can come back
    * off-by-1 µs vs DuckDB's exact integer epoch_us.
    */
  private[graft] def eventsFromPath(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    eventsTsPlan(spark, path) match {
      case NativeTimestamp =>
        spark.read.parquet(path)
          .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case NanosAsLong =>
        spark.read.schema(eventsNanosRawSchema).parquet(path)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    }
  }

  /** The streaming twin: `readStream` needs its schema up front, so the
    * footer probe runs as a batch read first, then the matching
    * (schema, ts-conversion) pair is applied to the stream.
    */
  private[graft] def eventsStream(spark: SparkSession, dirPath: String): DataFrame = {
    import org.apache.spark.sql.functions._
    eventsTsPlan(spark, dirPath) match {
      case NativeTimestamp =>
        val fileSchema = spark.read.parquet(dirPath).schema
        spark.readStream.schema(fileSchema).parquet(dirPath)
          .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case NanosAsLong =>
        spark.readStream.schema(eventsNanosRawSchema).parquet(dirPath)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
