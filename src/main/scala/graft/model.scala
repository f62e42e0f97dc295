package graft

/** Core data model (SURVEY.md §1).
  *
  * Mirrors the reference's single `document_chunks` table
  * (`/root/reference/index_documents.py:213-224`, `README.md:83-91`) plus the
  * in-flight shapes of its pipeline. Embeddings are `Array[Float]` end-to-end
  * (parquet `list<float>`); MLlib `Vector` only at LSH boundaries.
  */
object model {

  /** One source document, pre-extracted text (S1/S2 output shape). */
  final case class RawDocument(docId: Long, filename: String, text: String)

  /** One chunk of one document (C1–C5 output shape).
    * `chunkIndex` is the 0-based position within the document — the
    * deterministic replacement for the reference's insert-order SERIAL id
    * (index_documents.py:217; SURVEY.md §7.4 risk 3).
    */
  final case class Chunk(
      docId: Long,
      filename: String,
      chunkIndex: Int,
      splitStrategy: String,
      chunkText: String)

  /** Chunk + embedding: the `document_chunks` row (index_documents.py:214-223). */
  final case class ChunkRow(
      docId: Long,
      filename: String,
      chunkIndex: Int,
      splitStrategy: String,
      chunkText: String,
      embedding: Array[Float])

  /** Split strategies (index_documents.py:67, :106-134). `overlap` is ignored
    * for Sentence/Paragraph; `chunkSize` ignored for Paragraph — exactly as in
    * the reference dispatcher (index_documents.py:110,131).
    */
  sealed trait SplitStrategy { def name: String }
  object SplitStrategy {
    final case class Fixed(chunkSize: Int, overlap: Int) extends SplitStrategy {
      require(chunkSize > 0, "chunk_size must be positive")
      require(overlap >= 0 && overlap < chunkSize,
        "overlap must be >= 0 and smaller than chunk_size")
      val name = "fixed"
    }
    /** target = max(200, chunkSize) chars per group (index_documents.py:116). */
    final case class Sentence(chunkSize: Int) extends SplitStrategy { val name = "sentence" }
    case object Paragraph extends SplitStrategy { val name = "paragraph" }

    def fromName(name: String, chunkSize: Int, overlap: Int): SplitStrategy =
      name match {
        case "fixed"     => Fixed(chunkSize, overlap)
        case "sentence"  => Sentence(chunkSize)
        case "paragraph" => Paragraph
        case other => throw new IllegalArgumentException(s"Unknown chunking strategy: $other")
      }
  }
}
