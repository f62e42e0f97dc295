package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.SplitStrategy
import graft.operators.{Chunkers, Embeddings, Index, Search}
import graft.sources.DocumentSources

/** CLI entry point mirroring the reference's argparse surface
  * (`/root/reference/index_documents.py:256-264`): ingest a directory of
  * documents, chunk, embed, write the parquet index — then optionally run a
  * semantic query against it.
  *
  * Usage:
  *   IndexCli --input <docsDir> --output <indexDir>
  *            [--strategy fixed|sentence|paragraph] [--chunk-size 1200]
  *            [--overlap 200] [--batch-size 32] [--embedding-dim 64]
  *            [--provider hashing-tf|gemini]
  *            [--embedding-model gemini-embedding-001]
  *            [--api-key-env GEMINI_API_KEY]
  *            [--jdbc-url jdbc:...] [--jdbc-table document_chunks]
  *            [--query "some text"] [--top-k 5] [--pdf-password pw] [--ocr]
  *
  * Provider selection matches `--embedding-model`/the reference's Gemini
  * client (index_documents.py:262, :142-164): `hashing-tf` is the
  * deterministic offline default; `gemini` speaks the public
  * batchEmbedContents REST contract ([[operators.GeminiEmbeddingProvider]])
  * with the key read from `--api-key-env`. `--jdbc-url` additionally loads
  * the chunk rows into a pgvector-style table via
  * [[graft.sources.Sinks.writeJdbcChunks]] (the reference's INSERT target,
  * index_documents.py:213-224); the parquet index is always written.
  */
object IndexCli {

  final case class Args(
      input: String = "", output: String = "",
      strategy: String = "fixed", chunkSize: Int = 1200, overlap: Int = 200,
      batchSize: Int = 32, embeddingDim: Int = 64,
      provider: String = "hashing-tf",
      embeddingModel: String = "gemini-embedding-001",
      apiKeyEnv: String = "GEMINI_API_KEY",
      jdbcUrl: Option[String] = None, jdbcTable: String = "document_chunks",
      query: Option[String] = None, topK: Int = 5,
      pdfPassword: String = "", ocr: Boolean = false)

  def parse(argv: Array[String]): Args = {
    def loop(a: Args, rest: List[String]): Args = rest match {
      case Nil => a
      case "--input" :: v :: t => loop(a.copy(input = v), t)
      case "--output" :: v :: t => loop(a.copy(output = v), t)
      case "--strategy" :: v :: t => loop(a.copy(strategy = v), t)
      case "--chunk-size" :: v :: t => loop(a.copy(chunkSize = v.toInt), t)
      case "--overlap" :: v :: t => loop(a.copy(overlap = v.toInt), t)
      case "--batch-size" :: v :: t => loop(a.copy(batchSize = v.toInt), t)
      case "--embedding-dim" :: v :: t => loop(a.copy(embeddingDim = v.toInt), t)
      case "--provider" :: v :: t => loop(a.copy(provider = v), t)
      case "--embedding-model" :: v :: t => loop(a.copy(embeddingModel = v), t)
      case "--api-key-env" :: v :: t => loop(a.copy(apiKeyEnv = v), t)
      case "--jdbc-url" :: v :: t => loop(a.copy(jdbcUrl = Some(v)), t)
      case "--jdbc-table" :: v :: t => loop(a.copy(jdbcTable = v), t)
      case "--query" :: v :: t => loop(a.copy(query = Some(v)), t)
      case "--top-k" :: v :: t => loop(a.copy(topK = v.toInt), t)
      case "--pdf-password" :: v :: t => loop(a.copy(pdfPassword = v), t)
      case "--ocr" :: t => loop(a.copy(ocr = true), t)
      case other :: _ => throw new IllegalArgumentException(s"Unknown argument: $other")
    }
    val a = loop(Args(), argv.toList)
    require(a.input.nonEmpty, "--input is required")
    require(a.output.nonEmpty, "--output is required")
    require(a.provider == "hashing-tf" || a.provider == "gemini",
      s"--provider must be hashing-tf|gemini, got: ${a.provider}")
    a
  }

  /** Provider factory for the parsed args. `post` is the HTTP transport
    * (injectable for tests — the Gemini provider's only side effect);
    * `env` is the secret lookup (defaults to the process environment).
    */
  def providerFactory(args: Args,
      post: (String, String, Map[String, String]) => String =
        operators.RestEmbeddingProvider.httpPostHeaders,
      env: String => Option[String] = sys.env.get): () => Embeddings.EmbeddingProvider =
    args.provider match {
      case "hashing-tf" => () => new Embeddings.HashingTfEmbedder(args.embeddingDim)
      case "gemini" =>
        val key = env(args.apiKeyEnv).getOrElse(throw new IllegalArgumentException(
          s"--provider gemini needs the API key env var ${args.apiKeyEnv} (override with --api-key-env)"))
        () => new operators.GeminiEmbeddingProvider(
          key, args.embeddingDim, args.embeddingModel, post = post)
      case other => throw new IllegalArgumentException(s"Unknown provider: $other")
    }

  /** The pipeline body, separated from main() for testability. */
  def run(spark: SparkSession, args: Args,
      post: (String, String, Map[String, String]) => String =
        operators.RestEmbeddingProvider.httpPostHeaders,
      env: String => Option[String] = sys.env.get): Long = {
    implicit val s: SparkSession = spark
    val strategy = SplitStrategy.fromName(args.strategy, args.chunkSize, args.overlap)
    // the reference opens PDFs with a corpus-wide password via PyMuPDF
    // (index_documents.py:38-47); same surface here. `--ocr` opts the
    // PDF path into the scanned-page tier (round 13) — without it,
    // image-only pages stay empty and the empty-text guard drops them,
    // the reference's exact behavior.
    val extractors: Seq[DocumentSources.TextExtractor] =
      new DocumentSources.PdfExtractor(args.pdfPassword, ocr = args.ocr) +:
        DocumentSources.defaultExtractors.filterNot(_.extensions.contains("pdf"))
    val docs = DocumentSources.readDocuments(spark, args.input, extractors)
    val cleaned = {
      import spark.implicits._
      docs.map(d => d.copy(text = d.text)) // extraction already raw text
        .toDF("docId", "filename", "text")
        .withColumn("text", graft.functions.TextFunctions.cleanText(col("text")))
        .where(length(col("text")) > 0)
        .as[graft.model.RawDocument]
    }
    val chunks = Chunkers.chunkDataset(cleaned, strategy)
    val rows = Embeddings.embedDataset(chunks,
      providerFactory(args, post, env), args.batchSize)
    Index.writeIndex(rows, args.output)
    val written = spark.read.parquet(args.output)
    val n = written.count()
    args.jdbcUrl.foreach { url =>
      graft.sources.Sinks.writeJdbcChunks(written, url, args.jdbcTable)
    }
    args.query.foreach { q =>
      Index.searchText(written, q, args.topK, args.embeddingDim)
        .show(args.topK, truncate = false)
    }
    n
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = run(spark, args)
    println(s"Indexed $n chunks into ${args.output}")
    spark.stop()
  }
}
