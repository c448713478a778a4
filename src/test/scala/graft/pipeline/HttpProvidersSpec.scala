package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The Ollama adapter's pinnable behavior WITHOUT a server (the network
  * itself is deliberately off the correctness path — SURVEY §7.1):
  * batching at `batchSize` texts per POST, order preservation across
  * batches, and loud refusal of count/width-mismatched responses (the
  * mis-alignment failure mode that silently corrupts a positionally
  * zipped embed stage).
  */
class HttpProvidersSpec extends AnyFunSuite {

  /** Canned-response transport: replies with index-encoded vectors so
    * order is checkable, and records every request for batch asserts.
    */
  private final class StubTransport(dim: Int) extends HttpTransport {
    val requests = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private var served = 0
    def post(url: String, body: String, timeoutMillis: Int): String = {
      requests += ((url, body))
      val n = mapper.readTree(body).get("input").size()
      val root = mapper.createObjectNode()
      val embs = root.putArray("embeddings")
      for (_ <- 0 until n) {
        val row = embs.addArray()
        for (j <- 0 until dim) row.add(served.toFloat + j / 100.0f)
        served += 1
      }
      mapper.writeValueAsString(root)
    }
  }

  test("requests batch at batchSize and preserve input order across batches") {
    val stub = new StubTransport(4)
    val p = new OllamaEmbeddingProvider(
      dimension = 4, model = "m", baseUrl = "http://unit.test", batchSize = 2,
      transport = stub)
    val out = p.embed(Seq("a", "b", "c", "d", "e"))
    assert(stub.requests.map(_._1).forall(_ == "http://unit.test/api/embed"))
    assert(stub.requests.size == 3) // 2 + 2 + 1
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(stub.requests.map(r => mapper.readTree(r._2).get("input").size()) == Seq(2, 2, 1))
    assert(stub.requests.forall(r => mapper.readTree(r._2).get("model").asText() == "m"))
    // vector i leads with the global serve index i — order survived batching
    assert(out.map(_.head.toInt) == Seq(0, 1, 2, 3, 4))
    assert(out.forall(_.length == 4))
  }

  test("count mismatch fails loudly instead of mis-aligning rows") {
    val lying = new HttpTransport {
      def post(url: String, body: String, timeoutMillis: Int): String =
        """{"embeddings": [[1.0, 2.0]]}""" // one vector for two texts
    }
    val p = new OllamaEmbeddingProvider(dimension = 2, transport = lying)
    val e = intercept[IllegalArgumentException] { p.embed(Seq("a", "b")) }
    assert(e.getMessage.contains("mis-align"))
  }

  test("width mismatch (wrong model dimension) fails loudly") {
    val narrow = new HttpTransport {
      def post(url: String, body: String, timeoutMillis: Int): String =
        """{"embeddings": [[1.0, 2.0, 3.0]]}"""
    }
    val p = new OllamaEmbeddingProvider(dimension = 64, transport = narrow)
    val e = intercept[IllegalArgumentException] { p.embed(Seq("a")) }
    assert(e.getMessage.contains("dimension mismatch")
      || e.getMessage.contains("expected 64"))
  }

  test("missing embeddings array (error payload) fails loudly") {
    val err = new HttpTransport {
      def post(url: String, body: String, timeoutMillis: Int): String =
        """{"error": "model not found"}"""
    }
    val p = new OllamaEmbeddingProvider(dimension = 2, transport = err)
    val e = intercept[IllegalArgumentException] { p.embed(Seq("a")) }
    assert(e.getMessage.contains("embeddings"))
  }

  test("adapter satisfies the provider contract the pipeline relies on") {
    // same dimension/order contract HashProjectionEmbedder honors —
    // the two are interchangeable behind IngestPipeline.embedStage
    val p: EmbeddingProvider =
      new OllamaEmbeddingProvider(dimension = 4, transport = new StubTransport(4))
    assert(p.dimension == 4)
    assert(p.embed(Nil).isEmpty)
  }
}
