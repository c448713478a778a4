package graft.search

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dense-retrieval read path (SURVEY.md §3.2, reference:
  * frappe_data_pipelines/services/search_service.py:63-135):
  *
  * {{{
  * embed(query) → [RLS semi-join] → cosine scan → top-(k·overFetch)
  *             → rerank → top-k
  * }}}
  *
  * Composition notes vs the reference:
  *  - RLS composes BEFORE the top-k (the reference only enforces RLS on
  *    the chunk doctype, not the vector search path — SURVEY §3.2 records
  *    this as a deliberate improvement, do not "fix" back to parity).
  *  - `orderBy(desc).limit(k)` lowers to TakeOrderedAndProject:
  *    per-partition top-k + driver merge, no global sort shuffle — the
  *    scan side stays embarrassingly parallel at 100 TB.
  *  - The rerank score is a native Column expression (word-set Jaccard,
  *    mirroring [[graft.pipeline.LexicalOverlapReranker]]) so the whole
  *    read path stays inside codegen; an external reranker would slot in
  *    as a mapPartitions stage over the k·overFetch candidates only.
  */
object SearchService {

  /** Word-set Jaccard rerank score as a native expression (equals
    * LexicalOverlapReranker.score on the same inputs — including empty
    * and whitespace-only strings: `split("")` yields `[""]`, which must
    * be dropped like the Scala twin's empty-token filter or two blank
    * texts score a perfect 1.0 and outrank every real match; review
    * finding r14).
    */
  def lexicalOverlap(a: Column, b: Column): Column = {
    val ta = array_remove(array_distinct(split(lower(trim(a)), "\\s+")), "")
    val tb = array_remove(array_distinct(split(lower(trim(b)), "\\s+")), "")
    val inter = size(array_intersect(ta, tb))
    val union = size(array_union(ta, tb))
    when(union === 0, lit(0.0)).otherwise(inter.cast("double") / union.cast("double"))
  }

  /** First-stage dense top-k: cosine against a broadcast one-row query
    * relation `query(qv)`; `excludeId` implements F9 self-exclusion.
    */
  def denseTopK(
      vectors: DataFrame,
      query: DataFrame,
      k: Int,
      excludeId: Option[Long] = None,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val base = excludeId.fold(vectors)(id => vectors.filter(col(idCol) =!= id))
    base
      .crossJoin(broadcast(query))
      // zero-norm vector (or query) ⇒ cosine 0/0 = NaN, and Spark
      // orders NaN ABOVE every double — garbage rows would fill the
      // top-k (review finding r14; AnnIndex documents the same hazard
      // and has callers pre-filter). rankedCosine pins NaN to -2.0,
      // below the entire cosine range, so degenerate rows rank last —
      // the ONE definition (VectorOps), not an inline twin that could
      // drift from the oracle-mirrored sentinel (review finding r15).
      .withColumn("score", VectorOps.rankedCosine(col(vecCol), col("qv")))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Roles that bypass RLS entirely (reference permissions.py:19-21 and
    * :53-55 — `frappe.get_roles(user)` containing either grants an empty
    * query condition, i.e. the unfiltered relation).
    */
  val AdminRoles: Set[String] = Set("Administrator", "System Manager")

  def isAdmin(roles: Seq[String]): Boolean = roles.exists(AdminRoles.contains)

  /** RLS gate: semi-join the scan against the accessible-id set
    * (owned ∪ shared, reference permissions.py:66-77 / SURVEY F8+J2).
    * `roles` models the reference's admin bypass (permissions.py:53-55):
    * an Administrator / System Manager caller gets the relation back
    * UNFILTERED — and, as important at 100 TB, with the semi-join
    * REMOVED FROM THE PLAN, not merely made vacuous; a vacuous
    * semi-join would still shuffle/broadcast the accessible-id set on
    * every admin list view, the reference's hottest query shape.
    */
  def rlsFilter(
      vectors: DataFrame,
      accessibleIds: DataFrame,
      idCol: String = "vec_id",
      roles: Seq[String] = Nil): DataFrame =
    if (isAdmin(roles)) vectors
    else {
      // an access-control gate must not guess: a multi-column relation
      // whose id is not FIRST would silently gate on the wrong column
      // (review finding r15) — over- or under-granting with no error
      require(accessibleIds.columns.length == 1,
        s"rlsFilter: accessibleIds must be a single-column id relation, got " +
          s"(${accessibleIds.columns.mkString(", ")}) — select the id column explicitly")
      vectors.join(
        accessibleIds, vectors(idCol) === accessibleIds.col(accessibleIds.columns.head), "left_semi")
    }

  /** Full read path: RLS → dense over-fetch (k·overFetch, reference
    * search_service.py:83) → lexical rerank over candidate text → top-k.
    * `candidateText(df)` attaches the text column used by the reranker.
    */
  def search(
      vectors: DataFrame,
      accessibleIds: DataFrame,
      query: DataFrame,       // one row: (qv array<float>, q_text string)
      k: Int = 10,
      overFetch: Int = 5,
      excludeId: Option[Long] = None,
      roles: Seq[String] = Nil): DataFrame = {
    val gated = rlsFilter(vectors, accessibleIds, roles = roles)
    val candidates = denseTopK(gated, query, k * overFetch, excludeId)
    candidates
      .withColumn("rerank_score", round(lexicalOverlap(col("q_text"), col("text")), 6))
      .orderBy(col("rerank_score").desc, col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** Search WITHIN one document (reference search_service.py:139-160:
    * `search_by_document` = `search` with the must-match payload filter
    * `{'source_drive_file': document_id}`). The filter composes BEFORE
    * the scan — on a parquet collection it reaches the reader as a
    * pushed filter (and prunes partitions when the store is
    * doc-partitioned), so the per-document search touches only that
    * document's rows; the reference pays a server-side payload-index
    * probe for the same effect. Everything downstream is [[search]]
    * verbatim: RLS → dense over-fetch → lexical rerank → top-k.
    */
  def searchByDocument(
      vectors: DataFrame,
      accessibleIds: DataFrame,
      query: DataFrame,       // one row: (qv array<float>, q_text string)
      documentId: Column,
      k: Int = 5,
      overFetch: Int = 5,
      docCol: String = "source_document",
      roles: Seq[String] = Nil): DataFrame =
    search(vectors.filter(col(docCol) === documentId), accessibleIds, query,
      k, overFetch, excludeId = None, roles = roles)

  /** Chunks most similar to a STORED chunk (reference
    * search_service.py:162-229 `find_similar_chunks`): the anchor's
    * embedding is retrieved by id from the collection itself, the scan
    * over-fetches k+1 (the +1 accounts for the anchor, which ranks
    * first against itself), then self is skipped and — when
    * `excludeSameDocument` — same-document rows are dropped FROM THAT
    * k+1 SLIVER before taking k. Reference parity includes the quirk:
    * under `exclude_same_document` the k+1 over-fetch can return fewer
    * than k rows (the reference filters after the limit too); callers
    * needing a guaranteed fill should over-fetch via `k` and re-limit.
    *
    * An unknown `chunkId` returns an EMPTY relation (reference
    * :186-187 `if not points: return []`), not an error. The anchor is
    * a one-row broadcast; the scan side stays partition-parallel with
    * the top-(k+1) lowering to TakeOrderedAndProject.
    */
  def findSimilarChunks(
      vectors: DataFrame,
      chunkId: Long,
      k: Int = 5,
      excludeSameDocument: Boolean = false,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      docCol: String = "source_document"): DataFrame = {
    val anchor = vectors.filter(col(idCol) === chunkId)
      .select(col(vecCol).as("qv"), col(docCol).as("q_doc"))
    val overFetched = vectors
      .crossJoin(broadcast(anchor))
      .withColumn("score", VectorOps.rankedCosine(col(vecCol), col("qv")))
      .orderBy(col("score").desc, col(idCol))
      .limit(k + 1)
      .filter(col(idCol) =!= chunkId)
    val crossDoc =
      if (excludeSameDocument) overFetched.filter(!(col(docCol) <=> col("q_doc")))
      else overFetched
    crossDoc
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .drop("qv", "q_doc")
  }

  /** External-reranker stage over an ALREADY-REDUCED candidate sliver —
    * the mapPartitions slot the scaladoc above promises. The reference
    * sends the whole candidate list in ONE rerank call
    * (search_service.py:270-301) and maps the returned indexed scores
    * back onto its rows; this does the same: candidates (top-k·overFetch,
    * never the corpus) are coalesced to one partition in their ranked
    * order, the [[graft.pipeline.BatchReranker]] is called once inside
    * the task, and each returned (index, score) picks its row. On
    * provider failure, reference parity: fall back to the first k
    * candidates in their original order with a null rerank_score
    * (search_service.py:304-316 returns `results[:top_k]`), loud in the
    * executor log, never a crashed query.
    *
    * Output adds `rerank_rank` (0-based, best first — the row order
    * authority; single-partition order is not a downstream contract)
    * and `rerank_score` (null on fallback).
    */
  def rerankStage(
      candidates: DataFrame,
      queryText: String,
      reranker: graft.pipeline.BatchReranker,
      k: Int,
      orderCols: Seq[Column],
      textCol: String = "text"): DataFrame = {
    val textIdx = candidates.schema.fieldNames.indexOf(textCol)
    require(textIdx >= 0,
      s"rerankStage: candidates have no '$textCol' column (${candidates.columns.mkString(", ")})")
    val outSchema = candidates.schema
      .add("rerank_rank", org.apache.spark.sql.types.LongType, nullable = false)
      .add("rerank_score", org.apache.spark.sql.types.DoubleType, nullable = true)
    // repartition(1), not coalesce(1): coalesce is a narrow dependency
    // and would collapse the upstream scan's parallelism if the
    // candidate plan lost its exchange boundary; an explicit one-row-
    // weight shuffle of k·overFetch rows costs nothing and keeps the
    // dense scan embarrassingly parallel under any plan shape
    val ordered = candidates.repartition(1).sortWithinPartitions(orderCols: _*)
    val rdd = ordered.rdd.mapPartitions { rows =>
      val list = rows.toVector
      if (list.isEmpty) Iterator.empty
      else {
        val ranked: Seq[(Int, Option[Double])] =
          try {
            val r = reranker.rerank(queryText, list.map(_.getString(textIdx)), k)
            // the reranker is a public seam: an implementation echoing
            // indices for some other batch must hit the FALLBACK, not
            // an IndexOutOfBounds outside this try (review finding
            // r14); and the contract is ≤ k rows out, so an over-long
            // result is truncated like the reference's results[:top_k]
            require(r.forall { case (i, _) => i >= 0 && i < list.size },
              s"reranker returned an out-of-range index for ${list.size} candidates")
            // DISTINCT indices too (review finding r15): duplicates
            // would emit the same candidate at multiple ranks and push a
            // real one out of the top-k — a malformed response must hit
            // the fallback, never silently mis-rank
            require(r.map(_._1).distinct.size == r.size,
              s"reranker returned duplicate indices: ${r.map(_._1).mkString(",")}")
            r.take(k).map { case (i, s) => (i, Some(s)) }
          } catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[rerankStage] reranker failed, " +
                s"falling back to vector order: ${e.getMessage}")
              list.indices.take(k).map(i => (i, None))
          }
        ranked.iterator.zipWithIndex.map { case ((i, s), rank) =>
          org.apache.spark.sql.Row.fromSeq(
            list(i).toSeq :+ rank.toLong :+ s.orNull)
        }
      }
    }
    candidates.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** [[search]] with the rerank hop routed through an external
    * [[graft.pipeline.BatchReranker]] instead of the inline codegen
    * expression. `queryText` is the caller's query string (an input,
    * not something to collect back off the query relation).
    * SearchServiceSpec pins this path with the lexical scorer lifted
    * through [[graft.pipeline.PairwiseBatchReranker]] equal to
    * [[search]] row-for-row, and the fallback equal to the dense
    * top-k.
    */
  def searchWithBatchReranker(
      vectors: DataFrame,
      accessibleIds: DataFrame,
      query: DataFrame,
      queryText: String,
      reranker: graft.pipeline.BatchReranker,
      k: Int = 10,
      overFetch: Int = 5,
      excludeId: Option[Long] = None,
      roles: Seq[String] = Nil): DataFrame = {
    val candidates =
      denseTopK(rlsFilter(vectors, accessibleIds, roles = roles), query, k * overFetch, excludeId)
    rerankStage(candidates, queryText, reranker, k,
      orderCols = Seq(col("score").desc, col("vec_id")))
      .orderBy(col("rerank_rank"))
  }
}
