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
  def httpPost(endpoint: String, body: String): String = {
    import java.net.http.{HttpRequest, HttpResponse}
    val client = sharedClient
    val req = HttpRequest.newBuilder(java.net.URI.create(endpoint))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"Embedding endpoint HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    resp.body()
  }
}
