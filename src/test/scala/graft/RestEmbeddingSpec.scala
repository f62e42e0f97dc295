package graft

import graft.operators.{Embeddings, RestEmbeddingProvider}
import graft.operators.Embeddings.ValidatingRetryProvider

/** RestEmbeddingProvider contract (index_documents.py:142-194): request
  * shape, the reference's response-shape error strings, retry/backoff
  * accounting through the validating wrapper, and the real java.net.http
  * transport against an in-process JDK HttpServer (incl. the 5xx-retry
  * path) — everything offline-testable about a remote embedding service.
  */
class RestEmbeddingSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def okJson(dim: Int, n: Int): String = {
    val vec = (0 until dim).map(i => (i + 1).toFloat / 10f)
    val one = vec.mkString("""{"values":[""", ",", "]}")
    Seq.fill(n)(one).mkString("""{"embeddings":[""", ",", "]}")
  }

  test("request body carries model, output_dimensionality, batched contents (escaped)") {
    val body = RestEmbeddingProvider.requestJson("m-1", 8, Seq("""he said "hi"""", "line\nbreak"))
    assert(body.contains(""""model":"m-1""""))
    assert(body.contains(""""output_dimensionality":8"""))
    assert(body.contains("""he said \"hi\""""))
    assert(body.contains("""line\nbreak"""))
  }

  test("valid response parses to exact float vectors, one per text") {
    val p = new RestEmbeddingProvider("unused", 4, "m", (_, _) => okJson(4, 2))
    val out = p.embed(Seq("a", "b"))
    assert(out.length == 2)
    assert(out.forall(_.toSeq == Seq(0.1f, 0.2f, 0.3f, 0.4f)))
  }

  test("missing embeddings / missing values raise the reference's error strings") {
    val noEmb = new RestEmbeddingProvider("unused", 4, "m", (_, _) => """{"other": 1}""")
    val e1 = intercept[RuntimeException](noEmb.embed(Seq("a")))
    assert(e1.getMessage == "Unexpected embedding response format (missing embeddings)")

    val noVals = new RestEmbeddingProvider("unused", 4, "m",
      (_, _) => """{"embeddings":[{"novalues": []}]}""")
    val e2 = intercept[RuntimeException](noVals.embed(Seq("a")))
    assert(e2.getMessage == "Unexpected embedding object format (missing values)")
  }

  test("wrapper rejects dim mismatch and count mismatch from the wire") {
    val wrongDim = new RestEmbeddingProvider("unused", 8, "m", (_, _) => okJson(4, 1))
    val e1 = intercept[RuntimeException](
      new ValidatingRetryProvider(wrongDim, 1, _ => ()).embed(Seq("a")))
    assert(e1.getMessage.contains("dimension"))

    val wrongCount = new RestEmbeddingProvider("unused", 4, "m", (_, _) => okJson(4, 1))
    val e2 = intercept[RuntimeException](
      new ValidatingRetryProvider(wrongCount, 1, _ => ()).embed(Seq("a", "b")))
    assert(e2.getMessage.contains("count mismatch"))
  }

  test("transient transport failures retried on the reference schedule, then succeed") {
    var calls = 0
    val flakyPost: (String, String) => String = (_, _) => {
      calls += 1
      if (calls <= 2) throw new RuntimeException("503 simulated")
      okJson(4, 1)
    }
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val p = new ValidatingRetryProvider(
      new RestEmbeddingProvider("unused", 4, "m", flakyPost), maxRetries = 5, sleeper = sleeps += _)
    val out = p.embed(Seq("a"))
    assert(out.length == 1 && calls == 3)
    assert(sleeps.toSeq == Seq(1000L, 2000L)) // min(2^attempt,16)s from attempt 0
  }

  test("real java.net.http transport against a local server; 5xx then 2xx retried") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    @volatile var hits = 0
    @volatile var lastBody = ""
    server.createContext("/embed", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        hits += 1
        lastBody = new String(ex.getRequestBody.readAllBytes, java.nio.charset.StandardCharsets.UTF_8)
        val (code, resp) = if (hits == 1) (500, "boom") else (200, okJson(4, 2))
        val bytes = resp.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val url = s"http://localhost:${server.getAddress.getPort}/embed"
      val p = new ValidatingRetryProvider(
        new RestEmbeddingProvider(url, 4, "m-1"), maxRetries = 3, sleeper = _ => ())
      val out = p.embed(Seq("hello", "world"))
      assert(out.length == 2 && out.head.length == 4)
      assert(hits == 2) // first attempt got the 500, retry succeeded
      assert(lastBody.contains(""""contents":["hello","world"]"""))
    } finally server.stop(0)
  }

  // ---------- GeminiEmbeddingProvider: the public REST wire contract ----------

  import graft.operators.GeminiEmbeddingProvider

  test("Gemini request JSON matches the public batchEmbedContents schema") {
    val body = GeminiEmbeddingProvider.requestJson("gemini-embedding-001", 768, Seq("alpha", "beta"))
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    val reqs = root.get("requests")
    assert(reqs != null && reqs.isArray && reqs.size == 2)
    val r0 = reqs.get(0)
    assert(r0.get("model").asText == "models/gemini-embedding-001")
    assert(r0.get("outputDimensionality").asInt == 768)
    assert(r0.get("content").get("parts").get(0).get("text").asText == "alpha")
    assert(reqs.get(1).get("content").get("parts").get(0).get("text").asText == "beta")
  }

  test("Gemini endpoint URL and x-goog-api-key header are the public contract") {
    var seenUrl = ""; var seenHeaders = Map.empty[String, String]
    val p = new GeminiEmbeddingProvider("test-key", 4, "gemini-embedding-001",
      "https://generativelanguage.googleapis.com",
      (url, _, hs) => { seenUrl = url; seenHeaders = hs; okJson(4, 1) })
    p.embed(Seq("a"))
    assert(seenUrl ==
      "https://generativelanguage.googleapis.com/v1beta/models/gemini-embedding-001:batchEmbedContents")
    assert(seenHeaders == Map("x-goog-api-key" -> "test-key"))
  }

  test("Gemini valid response round-trips to exact float vectors") {
    val p = new GeminiEmbeddingProvider("k", 4, post = (_, _, _) => okJson(4, 3))
    val out = p.embed(Seq("a", "b", "c"))
    assert(out.length == 3)
    assert(out.forall(_.toSeq == Seq(0.1f, 0.2f, 0.3f, 0.4f)))
  }

  test("Gemini provider reproduces the reference's four validation failures verbatim") {
    def withResp(resp: String, n: Int = 1, dim: Int = 4) =
      intercept[RuntimeException](
        new GeminiEmbeddingProvider("k", dim, post = (_, _, _) => resp)
          .embed(Seq.fill(n)("x"))).getMessage
    // index_documents.py:166
    assert(withResp("""{"other": 1}""") ==
      "Unexpected embedding response format (missing embeddings)")
    assert(withResp("""{"embeddings": []}""") ==
      "Unexpected embedding response format (missing embeddings)")
    // index_documents.py:171
    assert(withResp("""{"embeddings":[{"novalues":[]}]}""") ==
      "Unexpected embedding object format (missing values)")
    // index_documents.py:176-178
    assert(withResp(okJson(4, 1), n = 2) ==
      "Embedding count mismatch: got 1 results for 2 inputs")
    // index_documents.py:182-185
    assert(withResp(okJson(3, 1), n = 1, dim = 4) ==
      "Embedding dimensionality mismatch. Expected 4, got [3]...")
  }

  test("Gemini provider composes with the reference retry schedule") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val flaky = new GeminiEmbeddingProvider("k", 4, post = (_, _, _) => {
      calls += 1
      if (calls <= 2) throw new RuntimeException("429 simulated") else okJson(4, 1)
    })
    val out = new ValidatingRetryProvider(flaky, 5, sleeps += _).embed(Seq("a"))
    assert(out.length == 1 && calls == 3)
    assert(sleeps.toSeq == Seq(1000L, 2000L))
  }
}
