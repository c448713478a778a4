package graft.pipeline

/** External-model provider seams (SURVEY.md §7.1). The reference hides
  * Ollama/OpenRouter/Cohere behind small classes with a common shape
  * (reference: frappe_data_pipelines/services/embedding_service.py:72-83
  * — the EmbeddingProvider ABC); we mirror that with traits whose
  * deterministic local implementations keep the whole pipeline hermetic
  * and oracle-checkable. HTTP adapters would implement the same traits
  * and are deliberately NOT on the correctness path.
  *
  * All implementations must be Serializable: instances are constructed
  * once per partition inside `mapPartitions` (connection-reuse pattern,
  * reference: services/qdrant_service.py:13-49 lazy singletons).
  */
trait EmbeddingProvider extends Serializable {
  def dimension: Int
  /** Embed a batch; MUST preserve input order (the reference sorts
    * responses by index to restore it — embedding_service.py:172).
    */
  def embed(texts: Seq[String]): Seq[Array[Float]]
}

/** Deterministic hash-projection embedder: token t contributes ±1/k to
  * dimension j by the parity of a 64-bit mix of (token, j). Stable across
  * JVMs (no object hashCode), unit-normalized. Dim default mirrors the
  * reference's fallback dim 384→here 64 to match the test embeddings
  * table width (services/qdrant_service.py:69-84).
  */
final class HashProjectionEmbedder(val dimension: Int = 64) extends EmbeddingProvider {
  /** 64-bit mix with a murmur-style avalanche finalizer. The finalizer is
    * load-bearing: with a plain `base ^ j*phi` the parity bit's j-term
    * cancels in any token-pair XOR, making every token vector ±(one
    * global sign pattern) — balanced texts then embed to exactly zero.
    * The string hash is hoisted so the text is scanned once per token,
    * not once per (token, dimension).
    */
  private def stringHash(s: String): Long = {
    var h = 1125899906842597L // large prime
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    h
  }
  private def avalanche(base: Long, j: Int): Long = {
    var h = base ^ (j * 0x9E3779B97F4A7C15L)
    h *= 0xC2B2AE3D27D4EB4FL
    h ^= (h >>> 29)
    h *= 0x165667B19E3779F9L
    h ^= (h >>> 32)
    h
  }
  /** Per-instance sign-vector cache: instances live per partition, and a
    * real corpus has a Zipfian vocabulary, so most tokens are repeats.
    * Bounded to keep executor memory flat at scale.
    */
  @transient private lazy val signCache =
    new java.util.HashMap[String, Array[Float]]()
  private val maxCache = 1 << 16
  private def signVector(tok: String): Array[Float] = {
    val hit = signCache.get(tok)
    if (hit != null) return hit
    val base = stringHash(tok)
    val sv = new Array[Float](dimension)
    var j = 0
    while (j < dimension) {
      sv(j) = if ((avalanche(base, j) & 1L) == 0L) 1.0f else -1.0f
      j += 1
    }
    if (signCache.size < maxCache) signCache.put(tok, sv)
    sv
  }
  def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val toks = Option(t).getOrElse("").trim.split("\\s+").filter(_.nonEmpty)
    val v = new Array[Float](dimension)
    for (tok <- toks) {
      val sv = signVector(tok)
      var j = 0
      while (j < dimension) { v(j) += sv(j); j += 1 }
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (norm > 0) v.map(x => (x / norm).toFloat) else v
  }
}

/** Contextual-enrichment seam (reference: services/context_service.py
  * :115-202 — LLM prompt over (document[:32000], chunk) → ≤120-token
  * prefix; failures degrade to ""). The deterministic stub derives the
  * prefix from the document head, mirroring "situate this chunk within
  * the document" without a model.
  */
trait ContextProvider extends Serializable {
  def contextFor(documentHead: String, chunkText: String): String
}

final class HeadlineContextProvider extends ContextProvider {
  def contextFor(documentHead: String, chunkText: String): String = {
    val head = Option(documentHead).getOrElse("").trim.split("\\s+").take(8).mkString(" ")
    if (head.isEmpty) "" else s"[ctx] $head"
  }
}

/** Reranker seam (reference: services/search_service.py:239-316 — Cohere
  * rerank over k*5 candidates). Deterministic stub: score = Jaccard of
  * word sets, the usual lexical-overlap proxy.
  */
trait Reranker extends Serializable {
  def score(query: String, text: String): Double
}

final class LexicalOverlapReranker extends Reranker {
  def score(query: String, text: String): Double = {
    val q = query.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    if (q.isEmpty || t.isEmpty) 0.0
    else (q & t).size.toDouble / (q | t).size.toDouble
  }
}
