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
}
