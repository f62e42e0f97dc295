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
  * IMAGE decode is REAL (round-4): [[ImageDecoder]] and
  * [[decodeImageStats]] use `javax.imageio` (JDK built-in — PNG/JPEG/BMP/
  * GIF) to decode actual encoded bytes into pixel statistics. Audio/video
  * codecs are NOT in this container, so those stay behind the
  * clearly-marked deterministic [[StubDecoder]] / byte-strided
  * [[sampleFrames]]; a real codec drops in by implementing [[MediaDecoder]].
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

  /** STUB decoder for AUDIO/VIDEO — ??? in spirit: a real implementation
    * would decode the media and run a feature extractor; those codecs are
    * not in this container. Offline stand-in: a deterministic
    * byte-histogram folded to `featureDim` buckets (so tests can assert
    * exact outputs and the pipeline shape is real).
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

  /** REAL image decoder: `javax.imageio` (JDK built-in) decodes PNG/JPEG/
    * BMP/GIF bytes; features = [width, height, mean R, mean G, mean B,
    * (featureDim-5)-bin luminance histogram]. Undecodable bytes throw —
    * lenient pipelines pre-filter or quarantine, same contract as document
    * ingestion.
    */
  final class ImageDecoder(val featureDim: Int = 21) extends MediaDecoder {
    require(featureDim >= 6, "featureDim must fit w,h,meanRGB + >=1 histogram bin")
    def features(meta: org.apache.spark.sql.Row, content: Array[Byte]): Array[Float] = {
      val img = decodeImage(content)
      val (w, h) = (img.getWidth, img.getHeight)
      val bins = featureDim - 5
      val hist = new Array[Float](bins)
      var rs = 0L; var gs = 0L; var bs = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          rs += r; gs += g; bs += b
          // integer luminance (ITU-R 601 weights scaled to /1000)
          hist(((r * 299 + g * 587 + b * 114) / 1000) * bins / 256) += 1f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      Array(w.toFloat, h.toFloat, rs / n, gs / n, bs / n) ++ hist.map(_ / n)
    }
  }

  private def decodeImage(content: Array[Byte]): java.awt.image.BufferedImage = {
    javax.imageio.ImageIO.setUseCache(false) // memory streams, no temp files
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    if (img == null)
      throw new IllegalArgumentException("undecodable image bytes (no ImageIO reader)")
    img
  }

  /** Decode every `image` row's bytes with ImageIO and emit exact integer
    * pixel statistics: `(media_id, img_w, img_h, px_sum)` where px_sum =
    * Σ(r+g+b) over all pixels. Lossless formats (PNG) make these stats
    * oracle-checkable end-to-end: encode → bytes → decode → sums equals the
    * closed-form pixel formula (q45). Narrow, per-partition, no shuffle.
    */
  def decodeImageStats(df: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("img_w", IntegerType, nullable = false),
      StructField("img_h", IntegerType, nullable = false),
      StructField("px_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.where(col("meta.media_type") === "image")
      .select(col("media_id"), col("content"))
      .mapPartitions { it =>
        it.map { row =>
          val img = decodeImage(row.getAs[Array[Byte]]("content"))
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          org.apache.spark.sql.Row(row.getLong(0), img.getWidth, img.getHeight, sum)
        }
      }(enc)
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

  /** Deterministic 64×48 RGB pixel formula shared by the PNG generator and
    * the DuckDB oracle (q45): channel c(x,y) is a linear-congruential mix of
    * (id, x, y) mod 256. PNG is lossless, so decode recovers it exactly.
    */
  def synthPixel(id: Long, x: Int, y: Int): Int = {
    val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
    val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
    val b = ((id * 23 + x * 5 + y * 19) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Encode the formula image for `id` as real PNG bytes via ImageIO. */
  def synthPng(id: Long, w: Int = 64, h: Int = 48): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, synthPixel(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Build a deterministic in-memory media table for tests/demos: image
    * rows carry REAL encoded PNG bytes (the formula image), audio/video
    * rows carry synthetic blobs (codecs out of scope).
    */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val isImage = i % 3 == 0
      val bytes =
        if (isImage) synthPng(i.toLong)
        else Array.tabulate[Byte](64 + i)(j => ((i * 31 + j * 7) % 251).toByte)
      org.apache.spark.sql.Row(i.toLong,
        org.apache.spark.sql.Row(if (isImage) "image" else if (i % 3 == 1) "audio" else "video",
          if (isImage) "png" else if (i % 3 == 1) "wav" else "mp4",
          if (isImage) 64 else null,
          if (isImage) 48 else null,
          if (isImage) null else java.lang.Long.valueOf(1000L + i)),
        bytes)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), MediaRowSchema)
  }
}
