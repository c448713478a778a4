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
    def request(method: String, url: String, body: Option[String],
        timeoutMillis: Int, headers: Map[String, String]): String = {
      requests += ((url, body.getOrElse("")))
      val n = mapper.readTree(body.getOrElse("")).get("input").size()
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
      def request(method: String, url: String, body: Option[String],
        timeoutMillis: Int, headers: Map[String, String]): String =
        """{"embeddings": [[1.0, 2.0]]}""" // one vector for two texts
    }
    val p = new OllamaEmbeddingProvider(dimension = 2, transport = lying)
    val e = intercept[IllegalArgumentException] { p.embed(Seq("a", "b")) }
    assert(e.getMessage.contains("mis-align"))
  }

  test("width mismatch (wrong model dimension) fails loudly") {
    val narrow = new HttpTransport {
      def request(method: String, url: String, body: Option[String],
        timeoutMillis: Int, headers: Map[String, String]): String =
        """{"embeddings": [[1.0, 2.0, 3.0]]}"""
    }
    val p = new OllamaEmbeddingProvider(dimension = 64, transport = narrow)
    val e = intercept[IllegalArgumentException] { p.embed(Seq("a")) }
    assert(e.getMessage.contains("dimension mismatch")
      || e.getMessage.contains("expected 64"))
  }

  test("missing embeddings array (error payload) fails loudly") {
    val err = new HttpTransport {
      def request(method: String, url: String, body: Option[String],
        timeoutMillis: Int, headers: Map[String, String]): String =
        """{"error": "model not found"}"""
    }
    val p = new OllamaEmbeddingProvider(dimension = 2, transport = err)
    val e = intercept[IllegalArgumentException] { p.embed(Seq("a")) }
    assert(e.getMessage.contains("embeddings"))
  }

  /** Canned-response rerank transport: scores candidate i as nDocs - i
    * reversed by the `order` permutation, and records requests+headers.
    */
  private final class StubRerankTransport(order: Seq[(Int, Double)]) extends HttpTransport {
    val requests = scala.collection.mutable.ArrayBuffer.empty[(String, String, Map[String, String])]
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def request(method: String, url: String, body: Option[String],
        timeoutMillis: Int, headers: Map[String, String]): String = {
      requests += ((url, body.getOrElse(""), headers))
      val root = mapper.createObjectNode()
      val rs = root.putArray("results")
      order.foreach { case (i, s) =>
        val r = rs.addObject(); r.put("index", i); r.put("relevance_score", s)
      }
      mapper.writeValueAsString(root)
    }
  }

  test("cohere rerank: request shape, bearer header, indexed scores back") {
    val stub = new StubRerankTransport(Seq((2, 0.9), (0, 0.5)))
    val p = new CohereRerankProvider(apiKey = "KEY", model = "m",
      baseUrl = "http://unit.test", transport = stub)
    val out = p.rerank("q", Seq("a", "b", "c"), topN = 2)
    assert(out == Seq((2, 0.9), (0, 0.5)))
    val (url, body, headers) = stub.requests.head
    assert(url == "http://unit.test/v1/rerank")
    assert(headers("Authorization") == "Bearer KEY")
    val req = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    assert(req.get("model").asText() == "m")
    assert(req.get("query").asText() == "q")
    assert((0 until req.get("documents").size()).map(req.get("documents").get(_).asText())
      == Seq("a", "b", "c"))
    assert(req.get("top_n").asInt() == 2)
    // no call at all for an empty candidate list
    val before = stub.requests.size
    assert(p.rerank("q", Nil, topN = 2).isEmpty && stub.requests.size == before)
  }

  test("cohere rerank: malformed responses fail loudly, never mis-rank") {
    def provider(order: Seq[(Int, Double)]) = new CohereRerankProvider(
      apiKey = "k", transport = new StubRerankTransport(order))
    // out-of-range index
    val e1 = intercept[IllegalArgumentException] {
      provider(Seq((7, 0.9))).rerank("q", Seq("a", "b"), 2)
    }
    assert(e1.getMessage.contains("out of range"))
    // duplicate index
    val e2 = intercept[IllegalArgumentException] {
      provider(Seq((1, 0.9), (1, 0.8))).rerank("q", Seq("a", "b"), 2)
    }
    assert(e2.getMessage.contains("duplicate"))
    // unsorted scores (a shuffled top-k must not pass silently)
    val e3 = intercept[IllegalArgumentException] {
      provider(Seq((0, 0.2), (1, 0.8))).rerank("q", Seq("a", "b"), 2)
    }
    assert(e3.getMessage.contains("sorted"))
    // more results than asked
    val e4 = intercept[IllegalArgumentException] {
      provider(Seq((0, 0.9), (1, 0.8))).rerank("q", Seq("a", "b"), 1)
    }
    assert(e4.getMessage.contains("top_n"))
    // error payload with no results array
    val err = new HttpTransport {
      def request(method: String, url: String, body: Option[String],
          timeoutMillis: Int, headers: Map[String, String]): String =
        """{"message": "invalid api token"}"""
    }
    val e5 = intercept[IllegalArgumentException] {
      new CohereRerankProvider(apiKey = "bad", transport = err).rerank("q", Seq("a"), 1)
    }
    assert(e5.getMessage.contains("results"))
  }

  test("openrouter embed: sorts out-of-order response rows by index") {
    // the OpenAI-compatible API does not guarantee data order; the
    // reference sorts by index (embedding_service.py:171-172)
    val shuffled = new HttpTransport {
      def request(method: String, url: String, body: Option[String],
          timeoutMillis: Int, headers: Map[String, String]): String = {
        assert(url == "http://unit.test/api/v1/embeddings")
        assert(headers("Authorization") == "Bearer K2")
        """{"data": [
          {"index": 1, "embedding": [10.0, 0.0]},
          {"index": 0, "embedding": [20.0, 0.0]},
          {"index": 2, "embedding": [30.0, 0.0]}]}"""
      }
    }
    val p = new OpenRouterEmbeddingProvider(dimension = 2, apiKey = "K2",
      baseUrl = "http://unit.test", transport = shuffled)
    // input order restored: row 0 leads with 20, row 1 with 10, row 2 with 30
    assert(p.embed(Seq("a", "b", "c")).map(_.head.toInt) == Seq(20, 10, 30))
  }

  test("openrouter embed: duplicate or missing index refuses loudly") {
    val dup = new HttpTransport {
      def request(method: String, url: String, body: Option[String],
          timeoutMillis: Int, headers: Map[String, String]): String =
        """{"data": [
          {"index": 0, "embedding": [1.0, 0.0]},
          {"index": 0, "embedding": [2.0, 0.0]}]}"""
    }
    val p = new OpenRouterEmbeddingProvider(dimension = 2, apiKey = "k", transport = dup)
    val e = intercept[IllegalArgumentException] { p.embed(Seq("a", "b")) }
    assert(e.getMessage.contains("duplicate"))
  }

  /** Scripted qdrant transport: records every (method, url, body) and
    * serves per-URL canned responses; GET existence probe throws when
    * `collectionExists` is false (transports throw on 404).
    */
  private final class StubQdrantTransport(
      collectionExists: Boolean,
      searchResponse: String = """{"result": []}""") extends HttpTransport {
    val calls = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    def request(method: String, url: String, body: Option[String],
        timeoutMillis: Int, headers: Map[String, String]): String = {
      calls += ((method, url, body.getOrElse("")))
      if (method == "GET" && !collectionExists)
        throw new java.io.IOException(s"GET $url returned HTTP 404: not found")
      if (url.endsWith("/points/search")) searchResponse else """{"status": "ok"}"""
    }
  }

  test("qdrant store: creates the collection only when missing, cosine+dim") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val missing = new StubQdrantTransport(collectionExists = false)
    new QdrantVectorStore(collection = "c", baseUrl = "http://u",
      transport = missing).ensureCollection(64)
    assert(missing.calls.map(c => (c._1, c._2)) ==
      Seq(("GET", "http://u/collections/c"), ("PUT", "http://u/collections/c")))
    val create = mapper.readTree(missing.calls.last._3).get("vectors")
    assert(create.get("size").asInt() == 64 && create.get("distance").asText() == "Cosine")
    val present = new StubQdrantTransport(collectionExists = true)
    new QdrantVectorStore(collection = "c", baseUrl = "http://u",
      transport = present).ensureCollection(64)
    assert(present.calls.map(_._1) == Seq("GET")) // no create
  }

  test("qdrant store: upsert batches points with id/vector/payload shape") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val stub = new StubQdrantTransport(collectionExists = true)
    val store = new QdrantVectorStore(collection = "c", baseUrl = "http://u",
      batchSize = 2, transport = stub)
    val pts = (0 until 5).map(i => VectorPoint(s"id$i", Array(i.toFloat, 0f),
      Map("source_document" -> s"doc$i", "chunk_index" -> i.toString)))
    store.upsert(pts)
    assert(stub.calls.size == 3) // 2 + 2 + 1
    assert(stub.calls.forall(c => c._1 == "PUT" && c._2 == "http://u/collections/c/points?wait=true"))
    val first = mapper.readTree(stub.calls.head._3).get("points")
    assert(first.size() == 2)
    assert(first.get(0).get("id").asText() == "id0")
    assert(first.get(0).get("vector").size() == 2)
    assert(first.get(0).get("payload").get("source_document").asText() == "doc0")
  }

  test("qdrant store: 32-hex pipeline point ids go over the wire as canonical UUIDs (r15)") {
    // Qdrant rejects bare hex strings (only unsigned ints / UUIDs are
    // valid point ids) — the T6 md5 ids must be dashed on the way out
    // and undashed on the way back; non-hex ids pass through untouched
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val hexId = "0123456789abcdef0123456789abcdef"
    val stub = new StubQdrantTransport(collectionExists = true,
      searchResponse = """{"result": [
        {"id": "01234567-89ab-cdef-0123-456789abcdef", "score": 0.5},
        {"id": "plain", "score": 0.4}]}""")
    val store = new QdrantVectorStore(collection = "c", baseUrl = "http://u",
      transport = stub)
    store.upsert(Seq(VectorPoint(hexId, Array(1f), Map.empty),
      VectorPoint("plain", Array(2f), Map.empty)))
    val pts = mapper.readTree(stub.calls.head._3).get("points")
    assert(pts.get(0).get("id").asText() == "01234567-89ab-cdef-0123-456789abcdef")
    assert(pts.get(1).get("id").asText() == "plain")
    val out = store.search(Array(1f), limit = 2)
    assert(out.map(_._1) == Seq(hexId, "plain"))
  }

  test("qdrant store: search builds the reference's must-match filter and parses results") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val stub = new StubQdrantTransport(collectionExists = true,
      searchResponse = """{"result": [
        {"id": "p1", "score": 0.9, "payload": {"source_document": "d1"}},
        {"id": "p2", "score": 0.7}]}""")
    val store = new QdrantVectorStore(collection = "c", baseUrl = "http://u",
      transport = stub)
    val out = store.search(Array(1f, 0f), limit = 2, mustMatch = Map("lang" -> "en"))
    assert(out == Seq(("p1", 0.9, Map("source_document" -> "d1")), ("p2", 0.7, Map())))
    val req = mapper.readTree(stub.calls.head._3)
    assert(req.get("limit").asInt() == 2 && req.get("with_payload").asBoolean())
    val cond = req.get("filter").get("must").get(0)
    assert(cond.get("key").asText() == "lang")
    assert(cond.get("match").get("value").asText() == "en")
    // delete-by-document uses the same filter shape on the payload key
    store.deleteByDocument("docX")
    val del = mapper.readTree(stub.calls.last._3).get("filter").get("must").get(0)
    assert(stub.calls.last._2.endsWith("/points/delete"))
    assert(del.get("key").asText() == "source_document")
    assert(del.get("match").get("value").asText() == "docX")
  }

  test("qdrant store: malformed search response refuses loudly") {
    val bad = new StubQdrantTransport(collectionExists = true,
      searchResponse = """{"status": "error"}""")
    val store = new QdrantVectorStore(transport = bad)
    val e = intercept[IllegalArgumentException] { store.search(Array(1f), 1) }
    assert(e.getMessage.contains("result"))
  }

  test("pairwise reranker lifts to the batch seam with stable ties") {
    val b = new PairwiseBatchReranker(new LexicalOverlapReranker)
    // "x y" vs candidates: exact match 1.0, half overlap, disjoint 0.0,
    // and a tie (two identical candidates) resolved by candidate order
    val out = b.rerank("x y", Seq("z w", "x y", "x q", "x q"), topN = 3)
    assert(out.map(_._1) == Seq(1, 2, 3))
    assert(out.head._2 == 1.0)
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
