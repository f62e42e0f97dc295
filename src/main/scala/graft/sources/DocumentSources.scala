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
  * a [[TextExtractor]] trait. PDF/DOCX extraction is JDK-only and honestly
  * scoped (see [[DocFormats]]): DOCX is a full real implementation
  * (zip + document.xml, python-docx paragraph semantics); PDF covers
  * machine-generated documents broadly — all text-capable filter chains,
  * ToUnicode/Differences/Type0/predefined-CJK font encodings, encrypted
  * files (empty or supplied user password) — and quarantines the rest
  * (scanned pages, Type3 glyph programs) rather than mis-extracting.
  */
object DocumentSources {

  /** file bytes → full document text. One implementation per format. */
  trait TextExtractor extends Serializable {
    /** Lowercased extensions this extractor claims, e.g. Seq("pdf"). */
    def extensions: Seq[String]
    def extract(path: String, content: Array[Byte]): String
  }

  /** Real minimal PDF text extraction (scope: DocFormats.MinimalPdf) —
    * per-page text joined with \n, as index_documents.py:38-47. The
    * optional user password mirrors PyMuPDF's `Document(..., password=)`
    * (index_documents.py:38-47): one corpus-wide password, wrong password
    * throws → quarantine under lenient ingestion.
    */
  final class PdfExtractor(password: String = "", ocr: Boolean = false)
      extends TextExtractor {
    val extensions = Seq("pdf")
    def extract(path: String, content: Array[Byte]): String =
      if (ocr) DocFormats.MinimalPdf.extractTextOcr(content, password)
      else DocFormats.MinimalPdf.extractText(content, password)
  }

  /** Real DOCX extraction: body paragraphs, non-blank kept, joined with \n
    * (index_documents.py:51-55; python-docx `paragraphs` semantics).
    */
  final class DocxExtractor extends TextExtractor {
    val extensions = Seq("docx")
    def extract(path: String, content: Array[Byte]): String =
      DocFormats.MinimalDocx.extractText(content)
  }

  final class TxtExtractor extends TextExtractor {
    val extensions = Seq("txt")
    def extract(path: String, content: Array[Byte]): String =
      new String(content, "UTF-8")
  }

  /** HTML → prose via the shared RE2-portable strip chain (EXT, crawl
    * ingestion — beyond the reference's pdf/docx/txt surface).
    */
  final class HtmlExtractor extends TextExtractor {
    val extensions = Seq("html", "htm")
    def extract(path: String, content: Array[Byte]): String =
      graft.functions.TextFunctions.stripHtmlString(new String(content, "UTF-8"))
  }

  val defaultExtractors: Seq[TextExtractor] =
    Seq(new PdfExtractor, new DocxExtractor, new TxtExtractor, new HtmlExtractor)

  /** [[defaultExtractors]] with the scanned-page OCR tier enabled on PDFs
    * (opt-in — see [[DocFormats.MinimalPdf.extractTextOcr]]: textless
    * pages are read through the [[Ocr]] template-match engine; unreadable
    * ink quarantines under lenient ingestion instead of extracting
    * garbage; the default path stays reference-parity, scans → empty).
    */
  val ocrExtractors: Seq[TextExtractor] =
    Seq(new PdfExtractor(ocr = true), new DocxExtractor, new TxtExtractor,
      new HtmlExtractor)

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
    readDocumentsLenient(spark, dir, extractors).map {
      case (doc, None) => doc
      case (_, Some(err)) => throw new IllegalArgumentException(err)
    }
  }

  /** Fault-tolerant ingestion for the 100 TB posture: one corrupt or
    * unsupported file must NOT kill a 1000-executor job. Each row is
    * (document, error): `error = None` for clean extractions; on failure
    * the document carries empty text and `error = Some(message)` so callers
    * route rows to the pipeline or a quarantine sink with one filter —
    * the binaryFile-scan analog of `mode=PERMISSIVE` + `_corrupt_record`.
    * [[readDocuments]] is the strict wrapper (any error fails the job,
    * matching the reference's explicit rejection).
    */
  def readDocumentsLenient(
      spark: SparkSession, dir: String,
      extractors: Seq[TextExtractor] = defaultExtractors)
      : Dataset[(RawDocument, Option[String])] = {
    import spark.implicits._
    val byExt = extractors.flatMap(e => e.extensions.map(_ -> e)).toMap
    val files = spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    files.map { case (path, content) =>
      val ext = extensionOf(path)
      val name = path.substring(path.lastIndexOf('/') + 1)
      // docId from a stable content-independent hash of the path: no global
      // sort/exchange needed; collision-free enough for ingest (64-bit).
      val id = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(path.getBytes("UTF-8")).take(7).map("%02x".format(_)).mkString, 16)
      byExt.get(ext) match {
        case None =>
          (RawDocument(id, name, ""), Some(s"Unsupported file type: .$ext"))
        case Some(extractor) =>
          try (RawDocument(id, name, extractor.extract(path, content)), None)
          catch { case e: Exception =>
            (RawDocument(id, name, ""),
             Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"))
          }
      }
    }
  }

  /** JSONL document source — one JSON object per line, the interchange
    * format most training corpora ship in (c4/pile/dolma dumps). Lenient
    * by the S3 discipline: `PERMISSIVE` parse retains malformed lines in
    * `_corrupt_record`, and the result splits into (documents, quarantine)
    * with one filter instead of killing the job. Schema is EXPLICIT (the
    * id and text fields only; other keys are ignored by the parse), so
    * the reader never runs schema inference — at 100 TB an inference
    * pre-pass is a full extra scan.
    *
    * @return (docs `(doc_id, filename, text)`, quarantined raw lines)
    */
  def readDocumentsJsonl(spark: SparkSession, path: String,
      idField: String = "id", textField: String = "text")
      : (DataFrame, DataFrame) = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(idField, org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(textField, org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_corrupt_record", org.apache.spark.sql.types.StringType)))
    val raw = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // Spark requires caching/materialization barriers before filtering
      // on the corrupt-record column alone; selecting it WITH data columns
      // is the supported pattern
      .select(col(idField), col(textField), col("_corrupt_record"))
    val bad = raw.where(col("_corrupt_record").isNotNull ||
        col(idField).isNull || col(textField).isNull)
      .select(coalesce(col("_corrupt_record"),
        to_json(struct(col(idField), col(textField)))).as("raw_line"))
    val ok = raw.where(col("_corrupt_record").isNull &&
        col(idField).isNotNull && col(textField).isNotNull)
      .select(col(idField).as("doc_id"),
        concat(lit("jsonl:"), col(idField)).as("filename"),
        col(textField).as("text"))
    (ok, bad)
  }
}
