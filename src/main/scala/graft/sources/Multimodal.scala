package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (EXT mandate): images/audio/video travel as
  * opaque `binary` columns with a typed metadata struct; decode and
  * feature-extraction run as per-partition batch transforms (the JVM
  * analogue of arrow-batched pandas UDFs — one decoder instance per
  * partition, vectorized batches, no per-row setup).
  *
  * The actual codecs (JPEG/PNG/audio) are NOT in this container, so the
  * decode step is a clearly-marked deterministic stub ([[StubDecoder]]);
  * everything Spark-side — schema, batch shape, partitioning, null
  * semantics — is real and tested, and a real decoder drops in by
  * implementing [[MediaDecoder]].
  */
object Multimodal {

  /** Typed metadata carried next to every media blob. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),   // image|audio|video
    StructField("format", StringType, nullable = false),       // jpeg|png|wav|mp4…
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  val MediaRowSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("meta", MediaMetaSchema, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** blob → fixed-dim feature vector. Real impls wrap a codec + model. */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    def features(meta: org.apache.spark.sql.Row, content: Array[Byte]): Array[Float]
  }

  /** STUB decoder — ??? in spirit: a real implementation would decode the
    * image/audio and run a feature extractor. Offline stand-in: a
    * deterministic byte-histogram folded to `featureDim` buckets (so tests
    * can assert exact outputs and the pipeline shape is real).
    */
  final class StubDecoder(val featureDim: Int = 16) extends MediaDecoder {
    def features(meta: org.apache.spark.sql.Row, content: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      var i = 0
      while (i < content.length) { out((content(i) & 0xff) % featureDim) += 1f; i += 1 }
      val n = math.max(content.length, 1)
      out.map(_ / n)
    }
  }

  /** Per-partition batched feature extraction: adds `features array<float>`.
    * One decoder per partition (amortized setup, the mapInPandas batch
    * shape); narrow dependency, no shuffle.
    */
  def extractFeatures(df: DataFrame, decoder: MediaDecoder)(
      implicit spark: SparkSession): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      it.map { row =>
        val meta = row.getAs[org.apache.spark.sql.Row]("meta")
        val content = row.getAs[Array[Byte]]("content")
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ decoder.features(meta, content).toSeq)
      }
    }(enc)
  }

  /** Frame sampling for video blobs: emit every `everyNthByte`-strided slice
    * as a pseudo-frame (STUB for codec-level frame extraction — the real
    * impl would seek keyframes). Shows the row→many-rows (file→frames)
    * explode shape with bounded memory.
    */
  def sampleFrames(df: DataFrame, frameBytes: Int, maxFrames: Int): DataFrame = {
    val nFrames = least(floor(length(col("content")) / frameBytes).cast("int"), lit(maxFrames))
    df.withColumn("_n_frames", nFrames)
      .where(col("_n_frames") > 0) // blobs shorter than one frame emit nothing
      .withColumn("frame_index", explode(sequence(lit(0), col("_n_frames") - 1)))
      .withColumn("frame",
        expr(s"substring(content, frame_index * $frameBytes + 1, $frameBytes)"))
      .drop("_n_frames")
  }

  /** Build a deterministic in-memory media table for tests/demos. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val bytes = Array.tabulate[Byte](64 + i)(j => ((i * 31 + j * 7) % 251).toByte)
      org.apache.spark.sql.Row(i.toLong,
        org.apache.spark.sql.Row(if (i % 3 == 0) "image" else if (i % 3 == 1) "audio" else "video",
          if (i % 3 == 0) "png" else if (i % 3 == 1) "wav" else "mp4",
          if (i % 3 == 0) 64 else null,
          if (i % 3 == 0) 48 else null,
          if (i % 3 == 0) null else java.lang.Long.valueOf(1000L + i)),
        bytes)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), MediaRowSchema)
  }
}
