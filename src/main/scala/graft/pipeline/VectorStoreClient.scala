package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper

/** One point in an external vector store: content-addressed id (the
  * pipeline's `point_id`, T6), the embedding, and a flat string payload
  * (the reference stores source_document / chunk_index / text there —
  * tasks/process_embedding.py builds the same shape).
  */
final case class VectorPoint(
    id: String, vector: Array[Float], payload: Map[String, String])

/** Vector-store client seam (reference: services/qdrant_service.py).
  * The engine's NATIVE store is the parquet/index path
  * ([[graft.BatchSink]], `graft.operators.AnnLshIndex` /
  * `graft.operators.AnnIndex`) — distributed, crash-safe, and the one
  * every oracled query runs against. This seam is the reference's
  * "Server mode" (qdrant_service.py:25-42): a remote store a deployment
  * may already operate, fed from the pipeline's sink side. Like every
  * HTTP adapter it stays OFF the correctness path.
  *
  * Surface mirrors the reference's service methods: ensure_collection
  * (:61-84), upsert_vectors (:87-116), search with must-match payload
  * filters (:118-152), delete_by_document (:157-185).
  */
trait VectorStoreClient extends Serializable {
  def ensureCollection(dimension: Int): Unit
  def upsert(points: Seq[VectorPoint]): Unit
  def search(vector: Array[Float], limit: Int,
             mustMatch: Map[String, String] = Map.empty): Seq[(String, Double, Map[String, String])]
  def deleteByDocument(sourceDocument: String): Unit
}

/** [[VectorStoreClient]] over the public Qdrant REST API (server mode).
  * Protocol: `PUT /collections/{c}` creates (cosine distance, like the
  * reference's VectorParams), `PUT /collections/{c}/points?wait=true`
  * upserts `{"points": [{id, vector, payload}]}` in `batchSize` chunks,
  * `POST /collections/{c}/points/search` takes `{"vector", "limit",
  * "with_payload": true}` plus the same `{"filter": {"must":
  * [{"key", "match": {"value"}}]}}` shape the reference builds, and
  * `POST /collections/{c}/points/delete` deletes by the
  * `source_document` payload filter. Auth is Qdrant's `api-key` header
  * when configured (qdrant_service.py:35-41).
  *
  * HttpProvidersSpec pins (stubbed transport): create-only-when-missing,
  * upsert batching + point shape, the filter JSON, result parsing, and
  * loud refusal of a malformed search response.
  */
final class QdrantVectorStore(
    collection: String = "drive_documents",
    baseUrl: String = "http://localhost:6333",
    apiKey: Option[String] = None,
    batchSize: Int = 200,
    timeoutMillis: Int = 30000,
    transport: HttpTransport = new JdkHttpTransport) extends VectorStoreClient {
  require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")

  @transient private lazy val mapper = new ObjectMapper()
  private def hdrs: Map[String, String] = apiKey.map("api-key" -> _).toMap
  private def colUrl = s"$baseUrl/collections/$collection"

  /** Create the collection if missing (GET probes existence — the
    * transport throws on 404 — then PUT creates). A non-404 failure on
    * the probe surfaces from the create call instead: PUT on an
    * existing collection or an unreachable server both throw loudly,
    * never silently skip.
    */
  def ensureCollection(dimension: Int): Unit = {
    require(dimension >= 1, s"dimension must be >= 1, got $dimension")
    val exists =
      try { transport.request("GET", colUrl, None, timeoutMillis, hdrs); true }
      catch { case scala.util.control.NonFatal(_) => false }
    if (!exists) {
      val root = mapper.createObjectNode()
      val v = root.putObject("vectors")
      v.put("size", dimension)
      v.put("distance", "Cosine")
      transport.request("PUT", colUrl, Some(mapper.writeValueAsString(root)),
        timeoutMillis, hdrs)
    }
  }

  /** Qdrant accepts ONLY unsigned-integer or canonical-UUID point ids —
    * a bare 32-hex string is rejected with HTTP 400 at the first upsert
    * (review finding r15; the stub-transport tests can't see the server
    * contract). The pipeline's T6 point ids are 128-bit md5 hex —
    * exactly UUID-sized — so they go over the wire dashed 8-4-4-4-12;
    * [[localId]] strips the dashes on the way back so callers always
    * see the pipeline form.
    *
    * ID-CLASS CONTRACT (ADVICE r15 — the 32-hex/UUID ambiguity is
    * inherent, so state it instead of overclaiming): a 36-char
    * canonical-UUID id upserted by the caller goes over the wire
    * unchanged but comes back from [[search]] DASHLESS (32-hex),
    * because the wire form cannot record whether the dashes were the
    * caller's or this client's. Callers who need exact round-trip of
    * dashed UUIDs must compare via `id.replace("-", "")` — or use
    * integer ids, which pass through untouched in both directions.
    */
  private def wireId(id: String): String =
    if (id != null && id.length == 32 && id.forall(c =>
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))
      s"${id.substring(0, 8)}-${id.substring(8, 12)}-${id.substring(12, 16)}-" +
        s"${id.substring(16, 20)}-${id.substring(20)}"
    else id

  private def localId(id: String): String =
    if (id != null && id.length == 36 && id.count(_ == '-') == 4 &&
        wireId(id.replace("-", "")) == id)
      id.replace("-", "")
    else id

  def upsert(points: Seq[VectorPoint]): Unit =
    points.grouped(batchSize).foreach { batch =>
      val root = mapper.createObjectNode()
      val arr = root.putArray("points")
      batch.foreach { p =>
        val o = arr.addObject()
        o.put("id", wireId(p.id))
        val vec = o.putArray("vector")
        p.vector.foreach(vec.add)
        val pl = o.putObject("payload")
        p.payload.foreach { case (k, v) => pl.put(k, v) }
      }
      transport.request("PUT", s"$colUrl/points?wait=true",
        Some(mapper.writeValueAsString(root)), timeoutMillis, hdrs)
    }

  private def mustFilter(root: com.fasterxml.jackson.databind.node.ObjectNode,
                         mustMatch: Map[String, String]): Unit =
    if (mustMatch.nonEmpty) {
      val must = root.putObject("filter").putArray("must")
      mustMatch.foreach { case (k, v) =>
        val c = must.addObject()
        c.put("key", k)
        c.putObject("match").put("value", v)
      }
    }

  def search(vector: Array[Float], limit: Int,
             mustMatch: Map[String, String] = Map.empty): Seq[(String, Double, Map[String, String])] = {
    require(limit >= 1, s"limit must be >= 1, got $limit")
    val root = mapper.createObjectNode()
    val vec = root.putArray("vector")
    vector.foreach(vec.add)
    root.put("limit", limit)
    root.put("with_payload", true)
    mustFilter(root, mustMatch)
    val resp = mapper.readTree(transport.post(s"$colUrl/points/search",
      mapper.writeValueAsString(root), timeoutMillis, hdrs))
    val rs = resp.get("result")
    require(rs != null && rs.isArray,
      s"QdrantVectorStore: search response has no 'result' array: ${resp.toString.take(200)}")
    (0 until rs.size()).map { i =>
      val r = rs.get(i)
      val id = r.get("id"); val score = r.get("score")
      require(id != null && score != null && score.isNumber,
        s"QdrantVectorStore: result $i missing id/score: ${r.toString.take(120)}")
      val payload = Option(r.get("payload")).filter(_.isObject).map { p =>
        val it = p.properties().iterator()
        val b = Map.newBuilder[String, String]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
        b.result()
      }.getOrElse(Map.empty[String, String])
      (localId(id.asText()), score.doubleValue(), payload)
    }
  }

  def deleteByDocument(sourceDocument: String): Unit = {
    val root = mapper.createObjectNode()
    mustFilter(root, Map("source_document" -> sourceDocument))
    transport.post(s"$colUrl/points/delete", mapper.writeValueAsString(root),
      timeoutMillis, hdrs)
  }
}
