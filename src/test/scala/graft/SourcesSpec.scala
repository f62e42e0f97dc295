package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{DocumentSources, Multimodal}

/** Document ingestion (S1–S3) and multimodal column plumbing. */
class SourcesSpec extends SparkSpec {

  test("readDocuments: binaryFile scan + extension dispatch + filename basename") {
    val dir = Files.createTempDirectory("docs").toFile
    Files.write(new java.io.File(dir, "a.txt").toPath, "hello world".getBytes)
    Files.write(new java.io.File(dir, "b.pdf").toPath, "pdf-ish content".getBytes)
    Files.write(new java.io.File(dir, "c.docx").toPath, "para one\n\npara two".getBytes)
    val docs = DocumentSources.readDocuments(spark, dir.getAbsolutePath)
      .collect().map(d => d.filename -> d.text).toMap
    assert(docs("a.txt") == "hello world")
    assert(docs("b.pdf") == "pdf-ish content")
    assert(docs("c.docx") == "para one\npara two") // docx stub drops empty lines
  }

  test("readDocuments: unsupported extension fails the job (S3 dispatch)") {
    val dir = Files.createTempDirectory("docs2").toFile
    Files.write(new java.io.File(dir, "x.exe").toPath, Array[Byte](1, 2))
    val e = intercept[org.apache.spark.SparkException] {
      DocumentSources.readDocuments(spark, dir.getAbsolutePath).collect()
    }
    assert(e.getMessage.contains("Unsupported file type") ||
      String.valueOf(e.getCause).contains("Unsupported file type"))
  }

  test("multimodal: stub features are a normalized byte histogram") {
    val media = Multimodal.syntheticMedia(spark, 12)
    val out = Multimodal.extractFeatures(media, new Multimodal.StubDecoder(16))
    val feats = out.select("features").collect().map(_.getSeq[Float](0))
    assert(feats.forall(_.length == 16))
    feats.foreach(f => assert(math.abs(f.sum - 1.0f) < 1e-4))
  }

  test("multimodal: frame sampling caps frames and skips short blobs") {
    val media = Multimodal.syntheticMedia(spark, 5) // blobs are 64+i bytes
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, maxFrames = 3)
    val counts = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(n => n >= 2 && n <= 3))
    val short = Multimodal.sampleFrames(
      Multimodal.syntheticMedia(spark, 1), frameBytes = 1000, maxFrames = 3)
    assert(short.count() == 0)
    // every frame is exactly frameBytes long
    val lens = frames.select(length(col("frame"))).collect().map(_.getInt(0)).toSet
    assert(lens == Set(32))
  }

  test("index pipeline end-to-end over file sources (S1→P1→C1→E1)") {
    val dir = Files.createTempDirectory("docs3").toFile
    Files.write(new java.io.File(dir, "doc1.txt").toPath,
      ("spark engine " * 40).getBytes)
    val docs = DocumentSources.readDocuments(spark, dir.getAbsolutePath)
    val chunks = graft.operators.Chunkers.chunkDataset(docs,
      graft.model.SplitStrategy.Fixed(200, 50))
    val rows = graft.operators.Embeddings.embedDataset(chunks,
      () => new graft.operators.Embeddings.HashingTfEmbedder(16)).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.embedding.length == 16))
    assert(rows.forall(_.filename == "doc1.txt"))
  }
}
