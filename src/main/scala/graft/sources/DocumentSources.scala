package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** Document ingestion sources (SURVEY.md §2.1 S1–S3).
  *
  * The reference reads one local PDF/DOCX file at a time
  * (`/root/reference/index_documents.py:38-55,270-274`). Spark-first, the
  * source is `spark.read.format("binaryFile")` over a directory tree —
  * distributed, partitioned by file — with per-format text extraction behind
  * a [[TextExtractor]] trait. The extraction libraries (PDF/DOCX parsers)
  * are not available in this offline container, so those extractors are
  * clearly-marked deterministic stubs; the Spark-side plumbing (schema,
  * dispatch, partitioning, error semantics) is real and tested.
  */
object DocumentSources {

  /** file bytes → full document text. One implementation per format. */
  trait TextExtractor extends Serializable {
    /** Lowercased extensions this extractor claims, e.g. Seq("pdf"). */
    def extensions: Seq[String]
    def extract(path: String, content: Array[Byte]): String
  }

  /** STUB — a real impl would parse the PDF (per-page text, joined with \n,
    * as index_documents.py:38-47). Offline container has no JVM PDF lib;
    * this stub deterministically decodes bytes as UTF-8 so the pipeline
    * plumbing is exercised end-to-end.
    */
  final class PdfExtractorStub extends TextExtractor {
    val extensions = Seq("pdf")
    def extract(path: String, content: Array[Byte]): String =
      new String(content, "UTF-8")
  }

  /** STUB — a real impl would parse DOCX paragraphs, keep non-empty ones,
    * join with \n (index_documents.py:51-55). Same UTF-8 stand-in as PDF.
    */
  final class DocxExtractorStub extends TextExtractor {
    val extensions = Seq("docx")
    def extract(path: String, content: Array[Byte]): String =
      new String(content, "UTF-8").split("\n").filter(_.nonEmpty).mkString("\n")
  }

  final class TxtExtractor extends TextExtractor {
    val extensions = Seq("txt")
    def extract(path: String, content: Array[Byte]): String =
      new String(content, "UTF-8")
  }

  val defaultExtractors: Seq[TextExtractor] =
    Seq(new PdfExtractorStub, new DocxExtractorStub, new TxtExtractor)

  private def extensionOf(path: String): String = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val dot = name.lastIndexOf('.')
    if (dot < 0) "" else name.substring(dot + 1).toLowerCase
  }

  /** Distributed file ingestion: binaryFile scan → extension dispatch →
    * extraction. Unsupported extensions fail the job, matching the
    * reference's explicit rejection (index_documents.py:270-274) — pass a
    * `pathGlobFilter` to pre-filter instead when mixed trees are expected.
    * Emits `docId` = dense per-run id from a deterministic order (file path),
    * `filename` = base name only (index_documents.py:300).
    */
  def readDocuments(
      spark: SparkSession, dir: String,
      extractors: Seq[TextExtractor] = defaultExtractors): Dataset[RawDocument] = {
    import spark.implicits._
    val byExt = extractors.flatMap(e => e.extensions.map(_ -> e)).toMap
    val files = spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    files.map { case (path, content) =>
      val ext = extensionOf(path)
      val extractor = byExt.getOrElse(ext,
        throw new IllegalArgumentException(s"Unsupported file type: .$ext"))
      val name = path.substring(path.lastIndexOf('/') + 1)
      // docId from a stable content-independent hash of the path: no global
      // sort/exchange needed; collision-free enough for ingest (64-bit).
      val id = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(path.getBytes("UTF-8")).take(7).map("%02x".format(_)).mkString, 16)
      RawDocument(id, name, extractor.extract(path, content))
    }
  }
}
