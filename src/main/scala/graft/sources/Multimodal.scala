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
  * GIF) to decode actual encoded bytes into pixel statistics. AUDIO decode
  * is REAL for RIFF/WAV PCM (round-5): [[AudioDecoder]] and
  * [[decodeAudioStats]] use `javax.sound.sampled` (JDK built-in) to parse
  * actual WAV containers into sample statistics — and PCM is lossless, so
  * the stats are oracle-checkable end-to-end like the PNG path (q45/q81).
  * VIDEO decode is REAL for RIFF/AVI with uncompressed RGB24 (DIB) frames
  * (round-5 close): [[decodeAviRgb24]] hand-parses the genuine AVI
  * container layout — RIFF/hdrl/strf BITMAPINFOHEADER/movi chunking,
  * bottom-up BGR rows, 4-byte row stride — the video twin of the WAV
  * path, and uncompressed frames are lossless so pixel statistics replay
  * from the closed-form formula in DuckDB (q102). Compressed codecs
  * (H.264 etc.) are not in the JDK; [[ByteHistogramDecoder]] remains as
  * the explicit generic fallback for formats without a real decoder.
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

  /** Generic byte-histogram featureizer — the EXPLICIT fallback for media
    * formats without a real decoder in this container (compressed video
    * codecs; exotic images). Deterministic (tests assert exact outputs),
    * honest about what it is: a content signature, not a decode. Image,
    * WAV audio and AVI/RGB24 video have REAL decoders — [[ImageDecoder]] /
    * [[AudioDecoder]] / [[VideoDecoder]].
    */
  final class ByteHistogramDecoder(val featureDim: Int = 16) extends MediaDecoder {
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

  /** REAL audio decoder: `javax.sound.sampled` (JDK built-in) parses the
    * RIFF/WAV container; features = [frame count, sample rate, mean |s|,
    * (featureDim-3)-bin |amplitude| histogram] over 16-bit PCM samples.
    * Undecodable bytes throw (same quarantine contract as images).
    */
  final class AudioDecoder(val featureDim: Int = 11) extends MediaDecoder {
    require(featureDim >= 4, "featureDim must fit frames,rate,mean + >=1 bin")
    def features(meta: org.apache.spark.sql.Row, content: Array[Byte]): Array[Float] = {
      val (rate, samples) = decodeWavPcm16(content)
      val bins = featureDim - 3
      val hist = new Array[Float](bins)
      var absSum = 0L
      samples.foreach { s =>
        val a = math.abs(s.toInt)
        absSum += a
        hist(math.min(a * bins / 32769, bins - 1)) += 1f
      }
      val n = math.max(samples.length, 1).toFloat
      Array(samples.length.toFloat, rate, absSum / n) ++ hist.map(_ / n)
    }
  }

  /** REAL video decoder: [[decodeAviRgb24]] parses the AVI container;
    * features = [n_frames, width, height, mean R, mean G, mean B, mean
    * inter-frame absolute pixel delta (a motion statistic)]. Undecodable
    * bytes throw (same quarantine contract as images/audio).
    */
  final class VideoDecoder extends MediaDecoder {
    val featureDim = 7
    def features(meta: org.apache.spark.sql.Row, content: Array[Byte]): Array[Float] = {
      val v = decodeAviRgb24(content)
      var rs = 0L; var gs = 0L; var bs = 0L; var delta = 0L
      val px = v.w * v.h
      var f = 0
      while (f < v.frames.length) {
        val cur = v.frames(f)
        var i = 0
        while (i < px) {
          val rgb = cur(i)
          rs += (rgb >> 16) & 0xff; gs += (rgb >> 8) & 0xff; bs += rgb & 0xff
          if (f > 0) {
            val p = v.frames(f - 1)(i)
            delta += math.abs(((rgb >> 16) & 0xff) - ((p >> 16) & 0xff)) +
              math.abs(((rgb >> 8) & 0xff) - ((p >> 8) & 0xff)) +
              math.abs((rgb & 0xff) - (p & 0xff))
          }
          i += 1
        }
        f += 1
      }
      val n = (v.frames.length.toLong * px).toFloat
      val dn = math.max((v.frames.length - 1).toLong * px, 1L).toFloat
      Array(v.frames.length.toFloat, v.w.toFloat, v.h.toFloat,
        rs / n, gs / n, bs / n, delta / dn)
    }
  }

  /** A decoded uncompressed video: `frames(f)(y*w + x)` is the packed
    * 0xRRGGBB pixel of frame f, top-down row order.
    */
  final case class DecodedVideo(w: Int, h: Int, frames: Vector[Array[Int]])

  /** The 'MJPG' biCompression fourcc as a little-endian int. */
  private val MjpgFourcc: Int =
    'M'.toInt | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)

  /** Decode a RIFF/AVI video container — a REAL container parse, not a
    * byte cast: RIFF chunk walking, `strf` BITMAPINFOHEADER (width/height/
    * bit-depth/compression all honored), `movi` frame chunks (`##db`/
    * `##dc`). Two codecs decode:
    *
    *   - uncompressed RGB24 (BI_RGB, 24bpp): bottom-up BGR rows with
    *     4-byte stride padding — lossless, so pixel stats are
    *     oracle-exact (q102);
    *   - MJPEG ('MJPG'): each frame chunk is a JPEG image, decoded via
    *     `javax.imageio` — the common compressed capture format, decoded
    *     by a genuine JDK codec (lossy, so stats are spec-toleranced, not
    *     oracle-exact).
    *
    * Non-AVI bytes, other codecs, or other depths throw rather than
    * mis-decode — the [[decodeWavPcm16]] contract applied to video.
    */
  def decodeAviRgb24(content: Array[Byte]): DecodedVideo = {
    val buf = java.nio.ByteBuffer.wrap(content).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(content.length >= 12 && fourcc() == "RIFF",
      "undecodable video bytes: not a RIFF container")
    buf.getInt // riff size
    require(fourcc() == "AVI ", "undecodable video bytes: RIFF but not AVI")
    var w = -1; var h = -1
    var mjpeg = false
    val frames = Vector.newBuilder[Array[Int]]
    def walk(end: Int): Unit = {
      while (buf.position() + 8 <= end) {
        val id = fourcc()
        val size = buf.getInt
        val next = buf.position() + size + (size & 1) // RIFF even-padding
        // Forward-progress guard: a negative (or int-overflowing) chunk size
        // would point `next` at or before this chunk and loop forever on a
        // corrupt/adversarial blob. The contract is throw-to-quarantine.
        require(size >= 0 && next > buf.position(),
          s"undecodable video bytes: bad chunk size $size")
        id match {
          case "LIST" =>
            fourcc() // list type (hdrl/strl/movi) — contents self-identify
            walk(next)
          case "strf" if size >= 40 =>
            buf.getInt // biSize
            w = buf.getInt; h = buf.getInt
            buf.getShort // planes
            val bpp = buf.getShort
            val compression = buf.getInt
            mjpeg = compression == MjpgFourcc
            require(mjpeg || (bpp == 24 && compression == 0),
              s"unsupported AVI stream: ${bpp}bpp compression=$compression " +
                "(uncompressed RGB24 and MJPG decode here)")
          case cc if cc.endsWith("db") || cc.endsWith("dc") =>
            require(w > 0 && h > 0, "AVI frame chunk before strf header")
            if (mjpeg) {
              val img = decodeImage(java.util.Arrays.copyOfRange(
                content, buf.position(), buf.position() + size))
              require(img.getWidth == w && img.getHeight == h,
                s"MJPEG frame ${img.getWidth}x${img.getHeight} vs header ${w}x$h")
              val frame = new Array[Int](w * h)
              img.getRGB(0, 0, w, h, frame, 0, w)
              var i = 0
              while (i < frame.length) { frame(i) &= 0xffffff; i += 1 }
              frames += frame
            } else {
              val stride = ((w * 3 + 3) / 4) * 4
              require(size >= stride * h, s"AVI frame chunk too small: $size")
              val frame = new Array[Int](w * h)
              val base = buf.position()
              var y = 0
              while (y < h) {
                var x = 0
                val row = base + (h - 1 - y) * stride // bottom-up storage
                while (x < w) {
                  val b = content(row + x * 3) & 0xff
                  val g = content(row + x * 3 + 1) & 0xff
                  val r = content(row + x * 3 + 2) & 0xff
                  frame(y * w + x) = (r << 16) | (g << 8) | b
                  x += 1
                }
                y += 1
              }
              frames += frame
            }
          case _ => // avih, strh, idx1, JUNK… — skipped, sizes honored
        }
        buf.position(next)
      }
    }
    walk(content.length)
    require(w > 0 && h > 0, "undecodable video bytes: no strf video header")
    val fs = frames.result()
    // A headered-but-frameless AVI would make the feature means 0/0 = NaN
    // downstream; the quarantine contract says throw instead.
    require(fs.nonEmpty, "undecodable video bytes: AVI has no frames")
    DecodedVideo(w, h, fs)
  }

  /** Encode the formula frames for `id` as a RIFF/AVI MJPEG container:
    * same layout as [[synthAvi]] but biCompression='MJPG' and each movi
    * chunk is a real ImageIO-encoded JPEG — the compressed-codec twin of
    * the RGB24 writer for round-trip tests.
    */
  def synthAviMjpeg(id: Long, nFrames: Int, w: Int = 32, h: Int = 24,
      fps: Int = 10): Array[Byte] = {
    require(nFrames > 0 && w > 0 && h > 0)
    javax.imageio.ImageIO.setUseCache(false)
    val encoded = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, synthVideoPixel(id, f, x, y)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val b = bos.toByteArray
      if (b.length % 2 == 1) b :+ 0.toByte else b // RIFF even-padding
    }
    val strf = 8 + 40
    val strh = 8 + 56
    val strl = 12 + strh + strf
    val avih = 8 + 56
    val hdrl = 12 + avih + strl
    val movi = 12 + encoded.map(8 + _.length).sum
    val riff = 4 + hdrl + movi
    val buf = java.nio.ByteBuffer.allocate(8 + riff)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = { buf.put(s.getBytes("US-ASCII")); () }
    cc("RIFF"); buf.putInt(riff); cc("AVI ")
    cc("LIST"); buf.putInt(hdrl - 8); cc("hdrl")
    cc("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
      .putInt(nFrames).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); buf.putInt(strl - 8); cc("strl")
    cc("strh"); buf.putInt(56)
    cc("vids"); cc("MJPG")
    buf.putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(fps)
      .putInt(0).putInt(nFrames)
      .putInt(0).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    cc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(MjpgFourcc).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); buf.putInt(movi - 8); cc("movi")
    encoded.foreach { e => cc("00dc"); buf.putInt(e.length); buf.put(e) }
    buf.array()
  }

  /** Decode every `video` row's AVI bytes and emit exact integer pixel
    * statistics: `(media_id, n_frames, vid_w, vid_h, px_sum)` with px_sum
    * = Σ over frames and pixels of (r+g+b). Uncompressed frames are
    * lossless, so these replay from the closed-form formula in DuckDB
    * (q102) — the video twin of [[decodeImageStats]]/[[decodeAudioStats]].
    */
  def decodeVideoStats(df: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("vid_w", IntegerType, nullable = false),
      StructField("vid_h", IntegerType, nullable = false),
      StructField("px_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.where(col("meta.media_type") === "video")
      .select(col("media_id"), col("content"))
      .mapPartitions { it =>
        it.map { row =>
          val v = decodeAviRgb24(row.getAs[Array[Byte]]("content"))
          var sum = 0L
          v.frames.foreach { f =>
            var i = 0
            while (i < f.length) {
              val rgb = f(i)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              i += 1
            }
          }
          org.apache.spark.sql.Row(row.getLong(0), v.frames.length, v.w, v.h, sum)
        }
      }(enc)
  }

  /** Real frame sampling for AVI video rows: decode, keep every
    * `everyNth`-th frame up to `maxFrames`, emit one row per kept frame
    * with exact per-frame pixel sums — the file→frames explode with
    * bounded memory (frames of ONE row decode at a time; narrow, no
    * shuffle).
    */
  def aviFrames(df: DataFrame, everyNth: Int, maxFrames: Int)(
      implicit spark: SparkSession): DataFrame = {
    require(everyNth > 0 && maxFrames > 0, "everyNth and maxFrames must be positive")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_index", IntegerType, nullable = false),
      StructField("frame_px_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.where(col("meta.media_type") === "video")
      .select(col("media_id"), col("content"))
      .flatMap { row =>
        val v = decodeAviRgb24(row.getAs[Array[Byte]]("content"))
        v.frames.indices.collect {
          case f if f % everyNth == 0 && f / everyNth < maxFrames =>
            var sum = 0L
            val fr = v.frames(f)
            var i = 0
            while (i < fr.length) {
              val rgb = fr(i)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              i += 1
            }
            org.apache.spark.sql.Row(row.getLong(0), f, sum)
        }
      }(enc)
  }

  /** Decode a WAV container to (sampleRate, 16-bit PCM samples) via
    * javax.sound.sampled — a real container parse, not a byte cast: the
    * RIFF/fmt/data chunking, sample width and endianness all come from the
    * decoded `AudioFormat`. Mono 16-bit PCM only (the synth fixtures'
    * shape); other layouts throw rather than mis-decode.
    */
  def decodeWavPcm16(content: Array[Byte]): (Float, Array[Short]) = {
    val in = try javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(content))
    catch {
      case e: javax.sound.sampled.UnsupportedAudioFileException =>
        throw new IllegalArgumentException(s"undecodable audio bytes: ${e.getMessage}")
    }
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        s"expected mono 16-bit signed PCM, got $fmt")
      val bytes = in.readAllBytes()
      val n = bytes.length / 2
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        val lo = bytes(2 * i) & 0xff
        val hi = bytes(2 * i + 1) & 0xff
        out(i) =
          (if (fmt.isBigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort
        i += 1
      }
      (fmt.getSampleRate, out)
    } finally in.close()
  }

  /** Decode every `audio` row's WAV bytes and emit exact integer sample
    * statistics: `(media_id, n_samples, sample_rate, amp_sum)` with
    * amp_sum = Σ|sample|. PCM is lossless, so these are oracle-checkable
    * end-to-end against the sample formula (q81) — the audio twin of
    * [[decodeImageStats]]. Narrow, per-partition, no shuffle.
    */
  def decodeAudioStats(df: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("amp_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.where(col("meta.media_type") === "audio")
      .select(col("media_id"), col("content"))
      .mapPartitions { it =>
        it.map { row =>
          val (rate, samples) = decodeWavPcm16(row.getAs[Array[Byte]]("content"))
          var sum = 0L
          samples.foreach(s => sum += math.abs(s.toInt))
          org.apache.spark.sql.Row(row.getLong(0), samples.length, rate.toInt, sum)
        }
      }(enc)
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

  /** 64-bit DIFFERENCE HASH (dHash) of an image — the standard perceptual
    * image-dedup primitive (public algorithm: Krawetz, "Kind of Like
    * That"): average-pool the luminance onto a 9×8 grid and emit one bit
    * per horizontal gradient (cell brighter than its right neighbor).
    * Re-encodes and small edits move a few bits; unrelated images differ
    * in ~32. Determinism discipline: OWN integer pooling (no AWT scaler —
    * its interpolation is platform-dependent) and cross-multiplied integer
    * mean comparison (no division, no float), so the hash is bit-identical
    * across JVMs, partitions and retries — the same content-addressed
    * property every dedup signature here has.
    */
  def dHash64(content: Array[Byte]): Long = {
    val img = decodeImage(content)
    dHashOfPixels(img.getWidth, img.getHeight, img.getRGB)
  }

  /** Exact mean(s1/c1) > mean(s2/c2) for non-negative integer sums/counts:
    * cross-multiply in 128 bits (`Math.multiplyHigh` + unsigned low word),
    * so the comparison is exact for ANY decodable media — a 64-bit
    * cross-multiply overflows once s·c exceeds 2^63 (≈4·10^8 pixels per
    * frame, ≈5·10^8 PCM samples per clip), which would silently flip
    * gradient bits instead of failing loudly. Still integer-only, no
    * division, no floats: the bit-determinism contract is unconditional.
    */
  private[graft] def meanGt(s1: Long, c1: Long, s2: Long, c2: Long): Boolean = {
    val hi1 = Math.multiplyHigh(s1, c2); val hi2 = Math.multiplyHigh(s2, c1)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(s1 * c2, s2 * c1) > 0
  }

  /** The dHash pixel-grid core shared by images ([[dHash64]]) and video
    * keyframes ([[videoDHash64]]): integer luminance sums per cell — cell
    * (i,j) covers the half-open block [i·w/9, (i+1)·w/9) × [j·h/8,
    * (j+1)·h/8) — then one gradient bit per horizontal neighbor pair
    * ([[meanGt]], exact at any frame size).
    */
  private def dHashOfPixels(w: Int, h: Int, rgbAt: (Int, Int) => Int): Long = {
    require(w >= 9 && h >= 8, s"frame too small for dHash (${w}x$h, need ≥9x8)")
    val sums = Array.ofDim[Long](9, 8)
    val counts = Array.ofDim[Long](9, 8)
    var y = 0
    while (y < h) {
      val j = math.min(y * 8 / h, 7)
      var x = 0
      while (x < w) {
        val i = math.min(x * 9 / w, 8)
        val rgb = rgbAt(x, y)
        val lum = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        sums(i)(j) += lum
        counts(i)(j) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        if (meanGt(sums(i)(j), counts(i)(j), sums(i + 1)(j), counts(i + 1)(j)))
          hash |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    hash
  }

  /** 64-bit video dHash: [[dHashOfPixels]] of the FIRST decoded frame (the
    * keyframe heuristic — a re-encode or re-container of the same footage
    * keeps its opening frame; full-sequence matching would hash every k-th
    * frame and vote, a composition of this primitive with
    * [[sampleFrames]]). Same exact banded pairing via
    * [[graft.operators.Dedup.hammingNearDupPairs]].
    */
  def videoDHash64(content: Array[Byte]): Long = {
    val v = decodeAviRgb24(content)
    require(v.frames.nonEmpty, "video has no decodable frames")
    val f = v.frames.head
    dHashOfPixels(v.w, v.h, (x, y) => f(y * v.w + x))
  }

  /** Relational video-dHash extraction — the [[imageDHashes]] shape. */
  def videoDHashes(df: DataFrame, idCol: String, bytesCol: String)(
      implicit spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("vhash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol), col(bytesCol))
      .mapPartitions { it =>
        it.map { row =>
          org.apache.spark.sql.Row(row.getLong(0),
            videoDHash64(row.getAs[Array[Byte]](1)))
        }
      }(enc)
  }

  /** FULL-SEQUENCE video signatures: the dHash of every `stride`-th
    * decoded frame as `(idCol, frame_idx, vhash)` — the composition
    * [[videoDHash64]]'s keyframe heuristic documents: a video is decoded
    * ONCE per row inside mapPartitions (off the shuffle path) and only
    * the 64-bit signatures ever shuffle, so the operator ships
    * O(frames/stride) longs per video, never pixels. Pairing is
    * aligned-frame voting
    * ([[graft.operators.Dedup.sequenceVoteNearDupPairs]]): frame i
    * matches only frame i, the re-encode/re-container model where the
    * timeline is preserved.
    */
  def videoSequenceDHashes(df: DataFrame, idCol: String, bytesCol: String,
      stride: Int)(implicit spark: SparkSession): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("vhash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol), col(bytesCol))
      .mapPartitions { it =>
        it.flatMap { row =>
          videoFrameDHashes(row.getAs[Array[Byte]](1), stride).map {
            case (fi, h) => org.apache.spark.sql.Row(row.getLong(0), fi, h)
          }
        }
      }(enc)
  }

  /** Per-frame dHashes of every `stride`-th decoded frame — the pure core
    * of [[videoSequenceDHashes]], also usable driver-side to greedily
    * select per-frame-diverse construction fixtures (the q122 selection
    * discipline extended to whole sequences).
    */
  def videoFrameDHashes(content: Array[Byte], stride: Int): Seq[(Int, Long)] = {
    require(stride > 0, s"stride must be positive, got $stride")
    val v = decodeAviRgb24(content)
    require(v.frames.nonEmpty, "video has no decodable frames")
    (0 until v.frames.length by stride).map { fi =>
      val f = v.frames(fi)
      (fi, dHashOfPixels(v.w, v.h, (x, y) => f(y * v.w + x)))
    }
  }

  /** Relational dHash extraction: `(idCol, dhash)` per image row — decode
    * inside mapPartitions, off the shuffle path (the decodeImageStats
    * shape). Feed the result to
    * [[graft.operators.Dedup.hammingNearDupPairs]] for exact banded
    * perceptual dedup.
    */
  def imageDHashes(df: DataFrame, idCol: String, bytesCol: String)(
      implicit spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol), col(bytesCol))
      .mapPartitions { it =>
        it.map { row =>
          org.apache.spark.sql.Row(row.getLong(0),
            dHash64(row.getAs[Array[Byte]](1)))
        }
      }(enc)
  }

  /** Per-TILE dHashes on a fixed pixel pitch — the signature for
    * CROP/PAD-TOLERANT image dedup: the image is cut into complete
    * `tilePx`×`tilePx` tiles anchored at pixel (0,0) and each tile is
    * dHashed independently ([[dHashOfPixels]] over the tile region only).
    * A crop or a solid-border pad by an exact multiple of the pitch maps
    * tile (x,y) to tile (x+dx, y+dy) with IDENTICAL pixels (lossless
    * formats), so a cropped/letterboxed re-encode survives as a constant
    * 2-D offset of equal tile hashes — the temporal-shift model of
    * [[videoSequenceDHashes]] in two dimensions, paired by
    * [[graft.operators.Dedup.croppedGridVoteNearDupPairs]]. Sub-pitch
    * crops change every tile's pixel content and are out of scope (the
    * honest contract: this tier catches grid-aligned crops/pads; the
    * general case needs keypoint signatures, not a hash grid). Pure core
    * shared with driver-side greedy fixture selection (the q122/q126
    * discipline).
    */
  def imageTileDHashesOf(content: Array[Byte], tilePx: Int): Seq[(Int, Int, Long)] = {
    require(tilePx >= 9, s"tilePx must be ≥ 9 (dHash needs a ≥9×8 grid), got $tilePx")
    val img = decodeImage(content)
    val (tw, th) = (img.getWidth / tilePx, img.getHeight / tilePx)
    require(tw > 0 && th > 0,
      s"image ${img.getWidth}x${img.getHeight} holds no complete $tilePx-px tile")
    for { tx <- 0 until tw; ty <- 0 until th } yield
      (tx, ty, dHashOfPixels(tilePx, tilePx,
        (x, y) => img.getRGB(tx * tilePx + x, ty * tilePx + y)))
  }

  /** Relational tile-dHash extraction: `(idCol, tile_x, tile_y, thash)`
    * per complete tile — decode once per image inside mapPartitions, off
    * the shuffle path (the [[imageDHashes]] shape); only 64-bit hashes
    * plus small-int grid coordinates ever shuffle, never pixels.
    */
  def imageTileDHashes(df: DataFrame, idCol: String, bytesCol: String,
      tilePx: Int)(implicit spark: SparkSession): DataFrame = {
    require(tilePx >= 9, s"tilePx must be ≥ 9 (dHash needs a ≥9×8 grid), got $tilePx")
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("tile_x", IntegerType, nullable = false),
      StructField("tile_y", IntegerType, nullable = false),
      StructField("thash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol), col(bytesCol))
      .mapPartitions { it =>
        it.flatMap { row =>
          val id = row.getLong(0)
          imageTileDHashesOf(row.getAs[Array[Byte]](1), tilePx).map {
            case (tx, ty, h) => org.apache.spark.sql.Row(id, tx, ty, h)
          }
        }
      }(enc)
  }

  /** Re-encode a rectangular crop of a decoded image as PNG (lossless —
    * the cropped duplicate model for [[imageTileDHashes]] fixtures and
    * specs). Pixels are copied explicitly so the encode does not depend
    * on the source image's buffer type.
    */
  def cropPng(content: Array[Byte], x0: Int, y0: Int, w: Int, h: Int): Array[Byte] = {
    val img = decodeImage(content)
    require(x0 >= 0 && y0 >= 0 && w > 0 && h > 0 &&
      x0 + w <= img.getWidth && y0 + h <= img.getHeight,
      s"crop ($x0,$y0,${w}x$h) outside ${img.getWidth}x${img.getHeight}")
    encodePngOf(w, h, (x, y) => img.getRGB(x0 + x, y0 + y))
  }

  /** Pad an image with a solid border (the letterbox model): the source
    * lands at offset (left, top) inside a larger canvas filled with
    * `rgb`. Lossless, so interior tiles keep their exact pixels.
    */
  def padPng(content: Array[Byte], left: Int, top: Int, right: Int,
      bottom: Int, rgb: Int = 0x000000): Array[Byte] = {
    require(left >= 0 && top >= 0 && right >= 0 && bottom >= 0,
      s"pad margins must be ≥ 0, got ($left,$top,$right,$bottom)")
    val img = decodeImage(content)
    val (w, h) = (img.getWidth + left + right, img.getHeight + top + bottom)
    encodePngOf(w, h, (x, y) =>
      if (x >= left && x < left + img.getWidth &&
          y >= top && y < top + img.getHeight)
        img.getRGB(x - left, y - top)
      else rgb)
  }

  /** Compose a `tilesX`×`tilesY` tile grid from source images: destination
    * tile (tx, ty) copies source tile (sx, sy) of the image bytes that
    * `pick(tx, ty)` returns. Decodes are memoized per distinct byte
    * content within one call. Fixture staging for the 2-D splice decoys
    * of the crop-tolerant probe (the synthAviComposed analogue).
    */
  def composePngTiles(tilePx: Int, tilesX: Int, tilesY: Int,
      pick: (Int, Int) => (Array[Byte], Int, Int)): Array[Byte] = {
    require(tilePx > 0 && tilesX > 0 && tilesY > 0,
      s"composePngTiles needs positive dims, got ($tilePx, $tilesX, $tilesY)")
    val cache = scala.collection.mutable.HashMap
      .empty[java.nio.ByteBuffer, java.awt.image.BufferedImage]
    val grid = Array.tabulate(tilesX, tilesY) { (tx, ty) =>
      val (bytes, sx, sy) = pick(tx, ty)
      val img = cache.getOrElseUpdate(java.nio.ByteBuffer.wrap(bytes),
        decodeImage(bytes))
      require(sx >= 0 && sy >= 0 && (sx + 1) * tilePx <= img.getWidth &&
        (sy + 1) * tilePx <= img.getHeight,
        s"source tile ($sx,$sy) outside ${img.getWidth}x${img.getHeight}")
      (img, sx, sy)
    }
    encodePngOf(tilesX * tilePx, tilesY * tilePx, (x, y) => {
      val (img, sx, sy) = grid(x / tilePx)(y / tilePx)
      img.getRGB(sx * tilePx + x % tilePx, sy * tilePx + y % tilePx)
    })
  }

  /** Encode a pixel function as PNG bytes — shared by the crop/pad/compose
    * staging helpers and [[synthPngMixed]].
    */
  private def encodePngOf(w: Int, h: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgbAt(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Exact k× box downscale (the thumbnail model): output pixel (x, y) is
    * the per-channel floor-average of the k×k source block at
    * (k·x, k·y). Dimensions must divide exactly — a ragged edge would
    * break the cell-alignment argument that makes [[dHash64]]
    * scale-invariant (see [[synthPngBlocked]]). Floor truncation makes a
    * general downscale only NEAR-exact; on k×k-constant source blocks the
    * average is the block value and the round-trip is lossless.
    */
  def downscalePng(content: Array[Byte], k: Int): Array[Byte] = {
    require(k > 0, s"downscale factor must be positive, got $k")
    val img = decodeImage(content)
    val (w, h) = (img.getWidth, img.getHeight)
    require(w % k == 0 && h % k == 0,
      s"downscale by $k needs dims divisible by $k, got ${w}x$h")
    encodePngOf(w / k, h / k, (x, y) => {
      var (r, g, b) = (0, 0, 0)
      var dy = 0
      while (dy < k) {
        var dx = 0
        while (dx < k) {
          val rgb = img.getRGB(k * x + dx, k * y + dy)
          r += (rgb >> 16) & 0xff; g += (rgb >> 8) & 0xff; b += rgb & 0xff
          dx += 1
        }
        dy += 1
      }
      val n = k * k
      ((r / n) << 16) | ((g / n) << 8) | (b / n)
    })
  }

  /** Mixed-formula PNG with 2×2-CONSTANT pixel blocks at dHash-aligned
    * dimensions — the fixture that makes [[downscalePng]](·, 2) EXACTLY
    * lossless AND [[dHash64]] bit-identical across the scale change:
    * with 18 | w and 16 | h the 9×8 pooling cells are contiguous
    * even-width/height pixel ranges, so every 2×2 block lies inside ONE
    * cell; the downscale maps each block to one pixel with the SAME value
    * (blocks are constant), shrinking every cell's (sum, count) by
    * exactly 4× — and [[meanGt]]'s cross-multiplied comparison is
    * invariant under a common factor. Scale invariance is arithmetic, not
    * statistical, so a thumbnail-dedup construction oracle stays at
    * Hamming 0.
    */
  def synthPngBlocked(id: Long, w: Int = 72, h: Int = 48): Array[Byte] = {
    require(w % 18 == 0 && h % 16 == 0,
      s"blocked fixture needs 18 | w and 16 | h (cell alignment), got ${w}x$h")
    encodePngOf(w, h, (x, y) => synthPixelMixed(id, x / 2, y / 2))
  }

  /** The 8 dihedral (D4) pixel transforms of a w×h grid, as
    * (newW, newH, mapped rgbAt): identity, three rotations, and their
    * mirrored forms. Shared by the orientation-canonical hash below and
    * the [[transformPng]] fixture/staging helper — both sides MUST use
    * the same index convention or the canonical-orbit argument breaks.
    */
  private def dihedralTransforms(w: Int, h: Int, rgbAt: (Int, Int) => Int)
      : Seq[(Int, Int, (Int, Int) => Int)] = Seq(
    (w, h, (x: Int, y: Int) => rgbAt(x, y)),                 // identity
    (h, w, (x: Int, y: Int) => rgbAt(y, h - 1 - x)),         // rot90 cw
    (w, h, (x: Int, y: Int) => rgbAt(w - 1 - x, h - 1 - y)), // rot180
    (h, w, (x: Int, y: Int) => rgbAt(w - 1 - y, x)),         // rot270 cw
    (w, h, (x: Int, y: Int) => rgbAt(w - 1 - x, y)),         // mirror x
    (h, w, (x: Int, y: Int) => rgbAt(y, x)),                 // transpose
    (w, h, (x: Int, y: Int) => rgbAt(x, h - 1 - y)),         // mirror y
    (h, w, (x: Int, y: Int) => rgbAt(w - 1 - y, h - 1 - x))) // anti-transpose

  /** ORIENTATION-CANONICAL 64-bit dHash: the minimum [[dHashOfPixels]]
    * over the image's 8 dihedral transforms (rotations by 0/90/180/270°
    * and their mirrors). A flipped or rotated re-upload has the SAME
    * transform orbit as the original — the D4 group permutes it — so its
    * canonical hash is BIT-IDENTICAL, not merely close: mirrored
    * duplicates that plain [[dHash64]] scores ~32 bits apart pair at
    * Hamming 0, and the construction stays oracle-checkable. Min over
    * signed longs is an arbitrary-but-total order; determinism follows
    * from [[dHashOfPixels]]'s integer-only contract. Pairs via
    * [[graft.operators.Dedup.hammingNearDupPairs]] exactly as the plain
    * hash does.
    */
  def dHashCanonical64(content: Array[Byte]): Long = {
    val img = decodeImage(content)
    dihedralTransforms(img.getWidth, img.getHeight, img.getRGB).map {
      case (tw, th, at) => dHashOfPixels(tw, th, at)
    }.min
  }

  /** Relational orientation-canonical dHash extraction — the
    * [[imageDHashes]] shape: `(idCol, chash)`, decode + 8 grid passes per
    * image inside mapPartitions, only the 64-bit canonical hash shuffles.
    */
  def imageCanonicalDHashes(df: DataFrame, idCol: String, bytesCol: String)(
      implicit spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("chash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol), col(bytesCol))
      .mapPartitions { it =>
        it.map { row =>
          org.apache.spark.sql.Row(row.getLong(0),
            dHashCanonical64(row.getAs[Array[Byte]](1)))
        }
      }(enc)
  }

  /** Re-encode dihedral transform `k` (0..7, [[dihedralTransforms]] order:
    * 0 identity, 1 rot90, 2 rot180, 3 rot270, 4 mirror-x, 5 transpose,
    * 6 mirror-y, 7 anti-transpose) of a decoded image as PNG — the
    * staged-duplicate model for [[dHashCanonical64]] fixtures and specs.
    */
  def transformPng(content: Array[Byte], k: Int): Array[Byte] = {
    require(k >= 0 && k < 8, s"dihedral transform index must be 0..7, got $k")
    val img = decodeImage(content)
    val (tw, th, at) = dihedralTransforms(img.getWidth, img.getHeight, img.getRGB)(k)
    encodePngOf(tw, th, at)
  }

  /** splitmix64-mixed pixel formula: channels from a finalizer-mixed hash
    * of (id, x, y). The [[synthPixel]] linear-congruential walk is
    * TRANSLATION-structured — neighboring tiles of one image differ by
    * near-constant channel shifts, so per-tile dHashes are
    * signature-degenerate (the q123/q127 lesson: a construction must
    * GUARANTEE diversity, not assume it); the mixed formula makes tiles
    * statistically independent. Deterministic, engine/rerun-stable.
    */
  def synthPixelMixed(id: Long, x: Int, y: Int): Int = {
    var z = id * 0x9E3779B97F4A7C15L + x * 0xBF58476D1CE4E5B9L +
      y * 0x94D049BB133111EBL
    z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27; z *= 0x94D049BB133111EBL
    z ^= z >>> 31
    (z & 0xFFFFFF).toInt
  }

  /** Encode the mixed formula image for `id` as real PNG bytes. */
  def synthPngMixed(id: Long, w: Int = 64, h: Int = 48): Array[Byte] =
    encodePngOf(w, h, (x, y) => synthPixelMixed(id, x, y))

  /** 64-bit audio ENVELOPE hash — the [[dHash64]] analogue over decoded
    * PCM: integer mean |amplitude| over 65 equal time windows, one bit
    * per gradient (window louder than its successor). A coarse,
    * loudness-invariant-by-gradient fingerprint in the energy-envelope
    * family (the simplest member of the Haitsma-Kalker 2002 lineage —
    * honest about being envelope-only, no spectral analysis): identical
    * and re-encoded-lossless audio hash equal, locally-edited audio moves
    * a few bits, unrelated audio differs in ~32. Same determinism
    * discipline as dHash64: integer sums, cross-multiplied comparisons,
    * no floats — bit-identical across JVMs/partitions/retries. Pairs via
    * [[graft.operators.Dedup.hammingNearDupPairs]].
    */
  def envelopeHash64(content: Array[Byte]): Long = {
    val (_, samples) = decodeWavPcm16(content)
    envelopeHashOfRange(samples, 0, samples.length)
  }

  /** The envelope-hash core over a sample RANGE [from, until) — shared by
    * the whole-clip hash above and the per-segment sequence hashes below.
    * Same determinism discipline: integer sums, [[meanGt]] cross-multiplied
    * comparison, no floats.
    */
  private[graft] def envelopeHashOfRange(samples: Array[Short], from: Int,
      until: Int): Long = {
    val n = until - from
    require(n >= 65,
      s"audio too short for envelope hash ($n samples, need ≥65)")
    val sums = new Array[Long](65)
    val counts = new Array[Long](65)
    var i = 0
    while (i < n) {
      val w = math.min(i.toLong * 65 / n, 64L).toInt
      sums(w) += math.abs(samples(from + i).toLong)
      counts(w) += 1
      i += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) {
      if (meanGt(sums(b), counts(b), sums(b + 1), counts(b + 1)))
        hash |= 1L << b
      b += 1
    }
    hash
  }

  /** SEGMENT-WISE envelope hashes: PCM split into consecutive
    * `segmentSamples`-sized segments (ragged tail dropped — a partial
    * segment's envelope is not comparable), each hashed with
    * [[envelopeHashOfRange]] — the audio twin of [[videoFrameDHashes]].
    * Because segmentation is FIXED-STRIDE from sample 0, an audio clip
    * trimmed by whole segments has hash sequence = the original's,
    * shifted — exactly what [[graft.operators.Dedup
    * .shiftedSequenceVoteNearDupPairs]] consumes (the operator is
    * signature-agnostic; R135 applies unchanged to audio).
    */
  def audioSegmentEnvelopeHashes(content: Array[Byte],
      segmentSamples: Int): Seq[(Int, Long)] = {
    require(segmentSamples >= 65,
      s"segmentSamples must be ≥ 65 (envelope windows), got $segmentSamples")
    val (_, samples) = decodeWavPcm16(content)
    val nSeg = samples.length / segmentSamples
    require(nSeg > 0,
      s"audio shorter than one segment (${samples.length} < $segmentSamples)")
    (0 until nSeg).map { s =>
      (s, envelopeHashOfRange(samples, s * segmentSamples, (s + 1) * segmentSamples))
    }
  }

  /** Relational segment-hash extraction: `(idCol, seg_idx, ahash)` rows —
    * decode inside mapPartitions (the [[videoSequenceDHashes]] shape);
    * only 64-bit signatures ever shuffle, never PCM.
    */
  def audioSequenceEnvelopeHashes(df: DataFrame, idCol: String, bytesCol: String,
      segmentSamples: Int)(implicit spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("seg_idx", IntegerType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol), col(bytesCol))
      .mapPartitions { it =>
        it.flatMap { row =>
          audioSegmentEnvelopeHashes(row.getAs[Array[Byte]](1), segmentSamples).map {
            case (s, h) => org.apache.spark.sql.Row(row.getLong(0), s, h)
          }
        }
      }(enc)
  }

  /** Relational envelope-hash extraction: `(idCol, ahash)` per audio row —
    * decode inside mapPartitions, off the shuffle path (the
    * [[imageDHashes]] shape).
    */
  def audioEnvelopeHashes(df: DataFrame, idCol: String, bytesCol: String)(
      implicit spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol), col(bytesCol))
      .mapPartitions { it =>
        it.map { row =>
          org.apache.spark.sql.Row(row.getLong(0),
            envelopeHash64(row.getAs[Array[Byte]](1)))
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

  /** Deterministic 16-bit PCM sample formula shared by the WAV generator
    * and the DuckDB oracle (q81): s(i) = ((id·73 + i·37) mod 65536) − 32768.
    * PCM is lossless, so decode recovers every sample exactly — the audio
    * twin of [[synthPixel]].
    */
  def synthSample(id: Long, i: Int): Int =
    (((id * 73 + i.toLong * 37) % 65536) - 32768).toInt

  /** Encode the formula samples for `id` as a REAL RIFF/WAV (mono 16-bit
    * little-endian PCM) container. Hand-rolled header + javax.sound decode
    * on the read side = a genuine container round trip.
    */
  def synthWav(id: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) { buf.putShort(synthSample(id, i).toShort); i += 1 }
    buf.array()
  }

  /** Amplitude-modulated formula clip (the q123 fixture): the carrier
    * tone scaled by a per-(id, block) integer gain — distinct ids get
    * distinct LOUDNESS ENVELOPES, which the phase-shifted sawtooth of
    * [[synthSample]] alone does not (its per-window mean |amplitude| is
    * nearly id-invariant, so envelope hashes would collide by family).
    * Same hand-rolled RIFF/WAV container as [[synthWav]].
    */
  def synthWavAm(id: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      val block = (i.toLong * 64 / nSamples).toInt
      val gain = ((id * 131 + block.toLong * 17) % 8) + 1 // 1..8
      val carrier = ((id * 73 + i.toLong * 37) % 4096) - 2048 // |·| < 2^11
      buf.putShort((carrier * gain).toShort) // |·| ≤ 16384 < 2^15
      i += 1
    }
    buf.array()
  }


  /** splitmix64 finalizer (public-domain arithmetic) — the gain mixer for
    * [[synthWavAmMixedSample]]; plain integer ops, bit-deterministic.
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** AM-formula sample with WELL-MIXED per-(id, 32-sample-block) gains
    * (1..8 via [[mix64]]) over the same sawtooth carrier. [[synthWavAm]]'s
    * linear gain walk is fine for ONE whole-clip hash (q123) but its
    * SEGMENT envelope hashes are heavily correlated across ids (measured:
    * 5/4000 seeds pass the q126-style diversity screen — the carrier
    * structure is id-invariant and only ~8 gain steps land per segment);
    * mixing the gain per 32-sample block makes most adjacent envelope
    * windows span a gain step, so segment hashes are effectively
    * id-random. The q127 fixture generator.
    */
  private def synthWavAmMixedSample(id: Long, i: Int): Short = {
    val gain = (mix64(id * 1000003L + (i >> 5)) & 7L) + 1 // 1..8 per 32-sample block
    val carrier = ((id * 73 + i.toLong * 37) % 4096) - 2048 // |·| < 2^11
    (carrier * gain).toShort // |·| ≤ 16384 < 2^15
  }

  /** Whole clip of the MIXED formula (the q127 seed clip). */
  def synthWavAmMixed(id: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] =
    synthWavAmMixedComposed(Seq((id, 0)), nSamples, sampleRate)

  /** Mixed-formula clip with a fully general per-SEGMENT spec: output
    * segment p carries the samples of source segment `parts(p)._2` of
    * clip seed `parts(p)._1`. Both formula terms depend only on the
    * ABSOLUTE sample index, so a trimmed clip is byte-identical to the
    * source clip's tail — the audio twin of [[synthAviComposed]];
    * trimmed-intro and shifted-splice fixtures for segment-wise dedup
    * (q127) compose here.
    */
  def synthWavAmMixedComposed(parts: Seq[(Long, Int)], segmentSamples: Int,
      sampleRate: Int = 8000): Array[Byte] = {
    require(parts.nonEmpty, "need at least one segment spec")
    require(segmentSamples > 0)
    val nSamples = parts.length * segmentSamples
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    parts.foreach { case (seed, srcSeg) =>
      var j = 0
      while (j < segmentSamples) {
        buf.putShort(synthWavAmMixedSample(seed, srcSeg * segmentSamples + j))
        j += 1
      }
    }
    buf.array()
  }

  /** Mixed-formula clip with samples in consecutive EQUAL PAIRS (sample i
    * carries the formula value at i/2) — the fixture that makes
    * [[decimateWav]](·, 2) an exactly-invertible resample for the
    * envelope hash: with 130 | nSamples the 65 envelope windows are
    * contiguous even-length sample ranges, so every pair lies inside ONE
    * window and decimation shrinks each window's (sum, count) by exactly
    * 2× — [[meanGt]]'s cross-multiplied comparison is invariant under the
    * common factor, so [[envelopeHash64]] is bit-identical across the
    * rate change (the audio twin of [[synthPngBlocked]]'s argument).
    */
  def synthWavPaired(id: Long, nSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    require(nSamples % 130 == 0,
      s"paired fixture needs 130 | nSamples (window alignment), got $nSamples")
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      buf.putShort(synthWavAmMixedSample(id, i / 2))
      i += 1
    }
    buf.array()
  }

  /** Keep every k-th PCM sample and re-encode at sampleRate/k — the
    * downsampled re-encode (duration preserved, rate halved). Requires
    * the rate to divide exactly; the sample count may be ragged (real
    * resamplers truncate), but on [[synthWavPaired]] fixtures the
    * round-trip loses nothing the envelope hash can see.
    */
  def decimateWav(content: Array[Byte], k: Int): Array[Byte] = {
    require(k > 0, s"decimation factor must be positive, got $k")
    val (rate, samples) = decodeWavPcm16(content)
    val sampleRate = rate.toInt
    require(sampleRate % k == 0,
      s"decimation by $k needs rate divisible by $k, got $sampleRate")
    val out = (0 until samples.length by k).map(samples(_))
    val dataLen = out.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate / k)
      .putInt(sampleRate / k * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    out.foreach(buf.putShort)
    buf.array()
  }

  /** Mixed-formula clip trimmed at the head by whole segments: sample
    * bytes are EXACTLY the full clip's tail (absolute-index formula).
    */
  def synthWavAmMixedTrimmed(id: Long, nSegments: Int, startSegment: Int,
      segmentSamples: Int, sampleRate: Int = 8000): Array[Byte] = {
    require(startSegment >= 0, s"startSegment must be ≥ 0, got $startSegment")
    synthWavAmMixedComposed((0 until nSegments).map(p => (id, p + startSegment)),
      segmentSamples, sampleRate)
  }

  /** Deterministic RGB24 video-pixel formula shared by the AVI generator
    * and the DuckDB oracle (q102): channel c(id, frame, x, y) is the
    * [[synthPixel]] family extended with a frame term. Uncompressed frames
    * are lossless, so decode recovers every pixel exactly.
    */
  def synthVideoPixel(id: Long, f: Int, x: Int, y: Int): Int = {
    val r = ((id * 31 + f.toLong * 41 + x * 7 + y * 13) % 256).toInt
    val g = ((id * 17 + f.toLong * 29 + x * 11 + y * 3) % 256).toInt
    val b = ((id * 23 + f.toLong * 37 + x * 5 + y * 19) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Encode the formula frames for `id` as a REAL RIFF/AVI container with
    * uncompressed RGB24 (DIB) frames: full hdrl (avih + strh 'vids'/'DIB '
    * + strf BITMAPINFOHEADER) and movi '00db' chunks, bottom-up BGR rows,
    * 4-byte stride. Hand-rolled writer + [[decodeAviRgb24]] on the read
    * side = a genuine container round trip (the video twin of [[synthWav]]).
    */
  def synthAvi(id: Long, nFrames: Int, w: Int = 32, h: Int = 24,
      fps: Int = 10): Array[Byte] =
    synthAviFrom(p => (id, p), nFrames, w, h, fps)

  /** [[synthAvi]] with a PER-FRAME formula seed: frame f draws its pixels
    * from `seeds(f)`, so a clip can share an exact opening frame with
    * `synthAvi(seeds(0), …)` yet diverge afterwards — the splice fixture
    * for sequence-vote dedup (the case the first-frame keyframe heuristic
    * of [[videoDHash64]] cannot distinguish).
    */
  def synthAviSpliced(seeds: Seq[Long], w: Int = 32, h: Int = 24,
      fps: Int = 10): Array[Byte] = {
    require(seeds.nonEmpty, "need at least one frame seed")
    synthAviComposed(seeds.zipWithIndex.map { case (s, f) => (s, f) }, w, h, fps)
  }

  /** [[synthAvi]] trimmed at the head: the clip's frame at position p has
    * the CONTENT of source frame p + startFrame — a real "trimmed intro"
    * duplicate for shift-tolerant sequence dedup fixtures (q126).
    */
  def synthAviTrimmed(id: Long, nFrames: Int, startFrame: Int, w: Int = 32,
      h: Int = 24, fps: Int = 10): Array[Byte] = {
    require(startFrame >= 0, s"startFrame must be ≥ 0, got $startFrame")
    synthAviComposed((0 until nFrames).map(p => (id, p + startFrame)), w, h, fps)
  }

  /** Fully general per-position frame spec: position p carries the pixels
    * of source frame `frames(p)._2` of clip seed `frames(p)._1` —
    * [[synthAviSpliced]] and [[synthAviTrimmed]] are the two named special
    * cases; arbitrary splice-at-shifted-position fixtures compose here.
    */
  def synthAviComposed(frames: Seq[(Long, Int)], w: Int = 32, h: Int = 24,
      fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame spec")
    synthAviFrom(frames(_), frames.length, w, h, fps)
  }

  private def synthAviFrom(specOf: Int => (Long, Int), nFrames: Int, w: Int, h: Int,
      fps: Int): Array[Byte] = {
    require(nFrames > 0 && w > 0 && h > 0)
    val stride = ((w * 3 + 3) / 4) * 4
    val frameBytes = stride * h
    def frame(f: Int): Array[Byte] = {
      val out = new Array[Byte](frameBytes)
      val (seed, srcFrame) = specOf(f)
      var y = 0
      while (y < h) {
        var x = 0
        val row = (h - 1 - y) * stride // bottom-up
        while (x < w) {
          val rgb = synthVideoPixel(seed, srcFrame, x, y)
          out(row + x * 3) = (rgb & 0xff).toByte           // B
          out(row + x * 3 + 1) = ((rgb >> 8) & 0xff).toByte // G
          out(row + x * 3 + 2) = ((rgb >> 16) & 0xff).toByte // R
          x += 1
        }
        y += 1
      }
      out
    }
    val strf = 8 + 40
    val strh = 8 + 56
    val strl = 12 + strh + strf
    val avih = 8 + 56
    val hdrl = 12 + avih + strl
    val movi = 12 + nFrames * (8 + frameBytes)
    val riff = 4 + hdrl + movi
    val buf = java.nio.ByteBuffer.allocate(8 + riff)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = { buf.put(s.getBytes("US-ASCII")); () }
    cc("RIFF"); buf.putInt(riff); cc("AVI ")
    cc("LIST"); buf.putInt(hdrl - 8); cc("hdrl")
    cc("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps).putInt(frameBytes * fps).putInt(0).putInt(0)
      .putInt(nFrames).putInt(0).putInt(1).putInt(frameBytes)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); buf.putInt(strl - 8); cc("strl")
    cc("strh"); buf.putInt(56)
    cc("vids"); cc("DIB ")
    buf.putInt(0).putInt(0).putInt(0)       // flags, prio+lang, initialFrames
      .putInt(1).putInt(fps)                // scale, rate
      .putInt(0).putInt(nFrames)            // start, length
      .putInt(frameBytes).putInt(-1).putInt(0) // bufSize, quality, sampleSize
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
    cc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(frameBytes).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); buf.putInt(movi - 8); cc("movi")
    var f = 0
    while (f < nFrames) {
      cc("00db"); buf.putInt(frameBytes); buf.put(frame(f)); f += 1
    }
    buf.array()
  }

  /** Build a deterministic in-memory media table for tests/demos: image
    * rows carry REAL encoded PNG bytes (the formula image), audio rows
    * carry REAL RIFF/WAV PCM bytes (the formula samples), video rows carry
    * REAL RIFF/AVI RGB24 bytes (the formula frames, 2 + id%3 of them).
    */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = i % 3 // 0 = image, 1 = audio, 2 = video
      val bytes = kind match {
        case 0 => synthPng(i.toLong)
        case 1 => synthWav(i.toLong, nSamples = 64 + i)
        case _ => synthAvi(i.toLong, nFrames = 2 + i % 3)
      }
      org.apache.spark.sql.Row(i.toLong,
        org.apache.spark.sql.Row(if (kind == 0) "image" else if (kind == 1) "audio" else "video",
          if (kind == 0) "png" else if (kind == 1) "wav" else "avi",
          if (kind == 0) 64 else if (kind == 2) 32 else null,
          if (kind == 0) 48 else if (kind == 2) 24 else null,
          if (kind == 0) null else java.lang.Long.valueOf(1000L + i)),
        bytes)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), MediaRowSchema)
  }
}
