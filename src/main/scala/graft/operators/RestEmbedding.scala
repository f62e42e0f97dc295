package graft.operators

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.operators.Embeddings.EmbeddingProvider

/** HTTP-shaped [[EmbeddingProvider]] — the reference's one external
  * dependency, re-expressed (`/root/reference/index_documents.py:142-194`):
  * each `embed()` call is ONE batched POST (the reference embeds a whole
  * batch per request, :159-164); the response carries `embeddings:
  * [{values: [...]}, ...]`, and a malformed shape raises the reference's
  * exact error strings (:165-172). Count/dimension validation and the
  * min(2^attempt,16)s retry schedule live in
  * [[Embeddings.ValidatingRetryProvider]], which callers wrap around this —
  * the same layering as the reference's retry loop around its client call.
  *
  * The transport is injectable for tests (`(endpoint, body) => response`);
  * the default posts JSON over `java.net.http` (JDK built-in — no new
  * dependencies). Intended per-partition use: construct inside
  * `Embeddings.embedDataset`'s `mkProvider` thunk so each partition owns one
  * client and nothing non-serializable crosses the closure boundary.
  */
final class RestEmbeddingProvider(
    endpoint: String,
    val dim: Int,
    model: String = "embedding-001",
    post: (String, String) => String = RestEmbeddingProvider.httpPost)
    extends EmbeddingProvider {

  def embed(texts: Seq[String]): Seq[Array[Float]] = {
    val resp = post(endpoint, RestEmbeddingProvider.requestJson(model, dim, texts))
    RestEmbeddingProvider.parseResponse(resp)
  }
}

object RestEmbeddingProvider {

  private val mapper = new ObjectMapper()

  /** Request body: the reference's embed_content shape — model, batched
    * contents, output_dimensionality (index_documents.py:160-164).
    */
  def requestJson(model: String, dim: Int, texts: Seq[String]): String = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("output_dimensionality", dim)
    val arr = root.putArray("contents")
    texts.foreach(arr.add)
    mapper.writeValueAsString(root)
  }

  /** Parse `{"embeddings": [{"values": [f, ...]}, ...]}`, raising the
    * reference's error strings on shape violations
    * (index_documents.py:165-172). Count/dim checks are the wrapper's job.
    */
  def parseResponse(body: String): Seq[Array[Float]] = {
    val root = mapper.readTree(body)
    val embs = root.get("embeddings")
    if (embs == null || !embs.isArray || embs.isEmpty)
      throw new RuntimeException("Unexpected embedding response format (missing embeddings)")
    (0 until embs.size).map { i =>
      val values = embs.get(i).get("values")
      if (values == null || !values.isArray)
        throw new RuntimeException("Unexpected embedding object format (missing values)")
      val out = new Array[Float](values.size)
      var j = 0
      while (j < out.length) { out(j) = values.get(j).floatValue(); j += 1 }
      out
    }
  }

  /** Shared client: HttpClient is thread-safe and pools connections; one
    * per JVM (≅ per executor) instead of one per request — a per-batch
    * client would redo TCP+TLS setup thousands of times per partition.
    */
  private lazy val sharedClient: java.net.http.HttpClient =
    java.net.http.HttpClient.newHttpClient()

  /** Default transport: POST the JSON body, require a 2xx, return the body.
    * Non-2xx throws (and is retried by ValidatingRetryProvider, matching the
    * reference's retry-on-rate-limit/5xx intent, index_documents.py:157).
    */
  def httpPost(endpoint: String, body: String): String =
    httpPostHeaders(endpoint, body, Map.empty)

  /** Transport with extra headers (used by [[GeminiEmbeddingProvider]] for
    * the public `x-goog-api-key` auth header).
    */
  def httpPostHeaders(endpoint: String, body: String,
      headers: Map[String, String]): String = {
    import java.net.http.{HttpRequest, HttpResponse}
    val client = sharedClient
    val b = HttpRequest.newBuilder(java.net.URI.create(endpoint))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"Embedding endpoint HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    resp.body()
  }
}

/** [[EmbeddingProvider]] speaking the PUBLIC Google Generative Language REST
  * API — the wire contract underneath the reference's
  * `client.models.embed_content(model=…, contents=[…],
  * config=EmbedContentConfig(output_dimensionality=…))` call
  * (`/root/reference/index_documents.py:159-164`; the google-genai SDK maps a
  * list of contents to the `batchEmbedContents` REST method, documented at
  * ai.google.dev/api/embeddings). One `embed()` = ONE batched POST to
  *
  *   `{base}/v1beta/models/{model}:batchEmbedContents`
  *
  * with body `{"requests": [{"model": "models/{model}", "content": {"parts":
  * [{"text": …}]}, "outputDimensionality": dim}, …]}` and auth via the
  * public `x-goog-api-key` header. The response is `{"embeddings":
  * [{"values": [f, …]}, …]}`.
  *
  * All four of the reference's validation failures are reproduced with its
  * exact message shapes (index_documents.py:165-185):
  *   - missing/empty `embeddings`        → "Unexpected embedding response format (missing embeddings)"
  *   - an item missing `values`          → "Unexpected embedding object format (missing values)"
  *   - result count ≠ input count        → "Embedding count mismatch: got N results for M inputs"
  *   - any vector dim ≠ requested        → "Embedding dimensionality mismatch. Expected D, got [d1, …]..."
  * Retry (min(2^attempt,16)s, 5 attempts) comes from wrapping in
  * [[Embeddings.ValidatingRetryProvider]], same layering as the reference's
  * loop (:157-194).
  */
final class GeminiEmbeddingProvider(
    apiKey: String,
    val dim: Int,
    model: String = "gemini-embedding-001",
    baseUrl: String = "https://generativelanguage.googleapis.com",
    post: (String, String, Map[String, String]) => String =
      RestEmbeddingProvider.httpPostHeaders)
    extends EmbeddingProvider {

  def endpoint: String = s"$baseUrl/v1beta/models/$model:batchEmbedContents"

  def embed(texts: Seq[String]): Seq[Array[Float]] = {
    val body = GeminiEmbeddingProvider.requestJson(model, dim, texts)
    val resp = post(endpoint, body, Map("x-goog-api-key" -> apiKey))
    GeminiEmbeddingProvider.parseResponse(resp, texts.length, dim)
  }
}

object GeminiEmbeddingProvider {

  private val mapper = new ObjectMapper()

  /** Batched request body per the public REST schema: one entry per text in
    * `requests`, each carrying the fully-qualified model name, a single-part
    * content, and `outputDimensionality` (the REST spelling of the SDK's
    * `output_dimensionality`, index_documents.py:163).
    */
  def requestJson(model: String, dim: Int, texts: Seq[String]): String = {
    val root = mapper.createObjectNode()
    val reqs = root.putArray("requests")
    texts.foreach { t =>
      val r = reqs.addObject()
      r.put("model", s"models/$model")
      r.putObject("content").putArray("parts").addObject().put("text", t)
      r.put("outputDimensionality", dim)
    }
    mapper.writeValueAsString(root)
  }

  /** Parse `{"embeddings": [{"values": [...]}, ...]}` and run the
    * reference's four validations with its exact message shapes
    * (index_documents.py:165-185).
    */
  def parseResponse(body: String, expectedCount: Int, expectedDim: Int): Seq[Array[Float]] = {
    val root = mapper.readTree(body)
    val embs = root.get("embeddings")
    if (embs == null || !embs.isArray || embs.isEmpty)
      throw new RuntimeException("Unexpected embedding response format (missing embeddings)")
    val out = (0 until embs.size).map { i =>
      val values = embs.get(i).get("values")
      if (values == null || !values.isArray)
        throw new RuntimeException("Unexpected embedding object format (missing values)")
      val v = new Array[Float](values.size)
      var j = 0
      while (j < v.length) { v(j) = values.get(j).floatValue(); j += 1 }
      v
    }
    if (out.length != expectedCount)
      throw new RuntimeException(
        s"Embedding count mismatch: got ${out.length} results for $expectedCount inputs")
    val badDims = out.collect { case v if v.length != expectedDim => v.length }
    if (badDims.nonEmpty)
      throw new RuntimeException(
        s"Embedding dimensionality mismatch. Expected $expectedDim, got ${badDims.take(5).mkString("[", ", ", "]")}...")
    out
  }
}
