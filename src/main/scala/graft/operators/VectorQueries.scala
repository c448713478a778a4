package graft.operators

import graft.Tables
import graft.functions.{VectorOps, VectorSql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dense-vector search operators (SURVEY.md §2.7 V1-V4) and the
  * similarity-search extensions over `embeddings` (64-dim float).
  *
  * Scale design: the query side of every top-k is tiny and explicitly
  * `broadcast`; the scan side computes scores partition-parallel and
  * `orderBy(...).limit(k)` lowers to TakeOrderedAndProject (per-partition
  * top-k + driver merge — no global sort shuffle). The knn-join keeps the
  * query set broadcast so the 100 TB side streams once.
  */
object VectorQueries {
  type Q = (SparkSession, String) => DataFrame

  private def emb(s: SparkSession, d: String): DataFrame = Tables.embeddings(s, d)

  /** Query vector(s) by id, renamed for the cross join. */
  private def queryVec(s: SparkSession, d: String, id: Long): DataFrame =
    emb(s, d).filter(col("vec_id") === id)
      .select(col("embedding").as("qv"), col("label").as("q_label"))

  val queries: Map[String, Q] = Map(
    // K4: collection introspection (qdrant_service.py:187-222
    // get_collection_info / get_all_collections): point count, vector
    // dimension (asserted uniform — the dim check K4 enforces on
    // write), id range, per-label segment counts as one partial-agg
    // scan of the collection.
    "k4_collection_info" -> ((s, d) => {
      emb(s, d)
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n_points"),
          countDistinct(size(col("embedding"))).as("n_dims_seen"),
          min(size(col("embedding"))).as("dim"),
          min(col("vec_id")).as("min_id"),
          max(col("vec_id")).as("max_id"))
        .orderBy("label")
    }),
    // int8 symmetric quantization — the storage transform a 100 TB
    // embedding table ships with (4× smaller than float32): per-vector
    // scale = max |x|, q_i = floor(127·x_i/scale + 0.5). floor(x+0.5)
    // instead of round() because Spark and DuckDB disagree on half-way
    // rounding; the floor form is identical in both. Summary scalars
    // (sum/min/max of q) are the oracle surface — element-for-element
    // equality is implied by the exact-integer sums.
    "embedding_quantize" -> ((s, d) => {
      val x = emb(s, d)
        .withColumn("maxabs",
          aggregate(col("embedding"), lit(0.0),
            (a, v) => greatest(a, abs(v.cast("double")))))
      val q = transform(col("embedding"), v =>
        when(col("maxabs") === 0.0, 0L)
          .otherwise(floor(v.cast("double") * 127.0 / col("maxabs") + 0.5).cast("long")))
      x.select(col("vec_id"), round(col("maxabs"), 6).as("scale6"),
          q.as("q"))
        .select(col("vec_id"), col("scale6"),
          aggregate(col("q"), lit(0L), (a, v) => a + v).as("q_sum"),
          array_min(col("q")).as("q_min"),
          array_max(col("q")).as("q_max"))
        .orderBy("vec_id")
    }),
    // V1: dense cosine top-k against one query vector
    // (qdrant_service.py:117-154; COSINE per :80-84).
    "v1_cosine_topk" -> ((s, d) => {
      emb(s, d).filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(queryVec(s, d, 0).select(col("qv"))))
        .select(col("vec_id"), col("label"),
          VectorOps.rankedCosine(col("embedding"), col("qv")).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    }),
    // V2: filtered search — payload must-match on label
    // (search_by_document, search_service.py:139-160) + F9 self-exclusion.
    "v2_filtered_topk" -> ((s, d) => {
      emb(s, d).filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(queryVec(s, d, 0)))
        .filter(col("label") === col("q_label"))
        .select(col("vec_id"), col("label"),
          VectorOps.rankedCosine(col("embedding"), col("qv")).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    }),
    // find_similar_chunks AS A SERVICE METHOD (VERDICT r15 ask #3;
    // search_service.py:162-229): anchor vector retrieved by id FROM
    // the collection, k+1 over-fetch, self-skip, cross-document-only —
    // the label column plays the source_drive_file payload role. The
    // query IS the SearchService method (SearchServiceSpec pins method
    // == this query's inline twin), so the driver hash-gates the
    // production API, not a re-composition.
    "v2_similar_chunks" -> ((s, d) => {
      graft.search.SearchService.findSimilarChunks(
        emb(s, d).select(col("vec_id"), col("embedding"), col("label")),
        chunkId = 0L, k = 10, excludeSameDocument = true, docCol = "label")
        .select(col("vec_id"), col("label"), col("score"))
        .orderBy(col("score").desc, col("vec_id"))
    }),
    // search_by_document AS A SERVICE METHOD (search_service.py:139-160):
    // must-match document filter composed BEFORE the scan, then the full
    // search read path (dense over-fetch k·5 → lexical rerank → top-k).
    // Admin roles exercise the RLS bypass leg — the semi-join is absent
    // from the plan, not vacuous.
    "v2_search_by_doc" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val vectors = emb(s, d)
        .join(broadcast(docs.select(col("doc_id"), col("text"), col("source"))),
          col("vec_id") === col("doc_id"))
        .select(col("vec_id"), col("embedding"), col("label"),
          col("text"), col("source"))
      val query = emb(s, d).filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
        .crossJoin(docs.filter(col("doc_id") === 0).select(col("text").as("q_text")))
      graft.search.SearchService.searchByDocument(
        vectors, accessibleIds = docs.select(col("doc_id")), query,
        documentId = lit("src3"), k = 5, overFetch = 5, docCol = "source",
        roles = Seq("Administrator"))
        .select(col("vec_id"), col("label"), col("score"), col("rerank_score"))
    }),
    // V3/V4: two-phase rerank — over-fetch k*5 by first-stage score, rerank
    // with a second deterministic scorer, emit top k
    // (search_service.py:83,239-316; deterministic stub per SURVEY §5).
    "v3_rerank" -> ((s, d) => {
      val q0 = queryVec(s, d, 0).select(col("qv").as("qv0"))
      val q1 = queryVec(s, d, 1).select(col("qv").as("qv1"))
      val candidates = emb(s, d).filter(!col("vec_id").isin(0, 1))
        .crossJoin(broadcast(q0))
        .select(col("vec_id"), col("embedding"),
          VectorOps.rankedCosine(col("embedding"), col("qv0")).as("stage1_score"))
        .orderBy(col("stage1_score").desc, col("vec_id"))
        .limit(50)
      candidates
        .crossJoin(broadcast(q1))
        .select(col("vec_id"), col("stage1_score"),
          VectorOps.rankedCosine(col("embedding"), col("qv1")).as("rerank_score"))
        .orderBy(col("rerank_score").desc, col("vec_id"))
        .limit(10)
    }),
    // Similarity-search extension: brute-force knn join — top-3 neighbors
    // for each of 20 query vectors in one pass (queries broadcast).
    "sim_knn_join" -> ((s, d) => {
      val queries = emb(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val cands = emb(s, d).filter(col("vec_id") >= 20)
      val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
      cands.crossJoin(broadcast(queries))
        .select(col("q_id"), col("vec_id"),
          VectorOps.cosineScore(col("embedding"), col("qv")).as("score"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("q_id"), col("vec_id"), col("rnk"), col("score"))
        .orderBy("q_id", "rnk")
    }),
    // §3.2 read path end-to-end: RLS semi-join → dense over-fetch (k*5)
    // → lexical rerank → top-k, via SearchService (V1+V3+V4+F8/F9/J2
    // composed in one plan).
    "search_e2e" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // documents is the dimension side here — broadcast it (and the RLS
      // id set) so the only non-mapside work is the final top-k.
      val vectors = emb(s, d)
        .join(broadcast(docs.select(col("doc_id"), col("text"))),
          col("vec_id") === col("doc_id"))
        .select(col("vec_id"), col("embedding"), col("label"), col("text"))
      val accessible = broadcast(
        docs.filter(col("lang").isin("en", "de")).select(col("doc_id"))
          .union(docs.filter(col("source") === "src_3").select(col("doc_id")))
          .distinct())
      val query = emb(s, d).filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        .crossJoin(docs.filter(col("doc_id") === 0).select(col("text").as("q_text")))
      graft.search.SearchService
        .search(vectors, accessible, query, k = 10, overFetch = 5, excludeId = Some(0L))
        .select(col("vec_id"), col("label"), col("score"), col("rerank_score"))
    }),
    // Dedup extension: embedding-cosine near-dup pairs, blocked by label
    // so the pair space is per-bucket. DEMO shape: the within-block
    // comparison is O(block²), acceptable only while blocks stay small
    // and bounded — this is NOT the 100 TB path. The scale path is
    // embed_neardup_lsh (AnnQueries): hyperplane-LSH buckets bound the
    // block size by construction. The block-size guard below makes the
    // bound LOUD: reuse at a scale where any label block exceeds it
    // fails the job instead of silently going quadratic.
    "embed_neardup" -> ((s, d) => embedNearDupDemo(emb(s, d))),
    // Hard-negative mining for contrastive training (the data side of
    // embedding-model training: each anchor needs its most-similar
    // OTHER-class neighbors as negatives — random negatives are too
    // easy and the gradient signal collapses). Anchors broadcast, one
    // streaming pass over the corpus, per-anchor top-3 by rounded
    // cosine among vectors with a DIFFERENT label; the q_id-partitioned
    // rank window runs on the anchor-keyed sliver. Same plan family as
    // sim_knn_join — at 100 TB this composes with the ANN index the
    // same way (probe cells first, mine within).
    "hard_negatives" -> ((s, d) => {
      val e = emb(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
          col("label").as("q_label"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
        .select(col("q_id"), col("vec_id"), col("label"),
          VectorOps.cosineScore(col("embedding"), col("qv")).as("score"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("q_id"), col("vec_id"), col("label"), col("rnk"), col("score"))
        .orderBy("q_id", "rnk")
    }),
    // Bitext mining via margin scoring (Artetxe & Schwenk, ACL 2019 —
    // the parallel-corpus miner behind CCMatrix/WikiMatrix): a raw
    // cosine threshold over-selects hubs (vectors close to EVERYTHING),
    // so each candidate pair is scored by its cosine RELATIVE to both
    // sides' average top-k neighborhoods: margin = cos(x,y) /
    // ((avgTopK(x→T) + avgTopK(y→A)) / 2); a pair mines only when it
    // stands out from both local densities (ratio margin > 1). Sides
    // are derived by id parity (the derived-corpus discipline); the
    // anchor set is bounded and broadcast, the candidate side streams
    // once, and BOTH direction averages come from the one scored
    // relation (two rank windows, no second scan). At 100 TB this
    // composes with the ANN index like sim_knn_join: probe cells first,
    // score within — margins only ever need the top-k neighborhood,
    // which is exactly what the index returns.
    "bitext_margin" -> ((s, d) => {
      val e = emb(s, d)
      val anchors = e.filter(col("vec_id") % 2 === 0 && col("vec_id") < 100)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val scored = e.filter(col("vec_id") % 2 === 1)
        .crossJoin(broadcast(anchors))
        .select(col("q_id"), col("vec_id"),
          VectorOps.cosineScore(col("embedding"), col("qv")).as("score"))
      val wf = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
      val wb = Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("q_id"))
      val ranked = scored
        .withColumn("rf", row_number().over(wf))
        .withColumn("rb", row_number().over(wb))
      // round the raw top-4 SUMS (exact multiples of 1e-6 — no
      // half-boundary cases) and fold the /4 into the final quotient;
      // an early sum/4 lands on quarter-millionth steps whose exact
      // .5 halves round differently across engines (measured: one
      // margin flipped 1.201093 vs 1.201091)
      val fwd = ranked.filter(col("rf") <= 4).groupBy("q_id")
        .agg(round(sum(col("score")), 6).as("sa"))
      val bwd = ranked.filter(col("rb") <= 4).groupBy("vec_id")
        .agg(round(sum(col("score")), 6).as("sb"))
      val margins = scored.join(fwd, "q_id").join(bwd, "vec_id")
        .withColumn("margin",
          round(col("score") * 8.0 / (col("sa") + col("sb")), 6))
      val wt = Window.partitionBy(col("q_id")).orderBy(col("margin").desc, col("vec_id"))
      margins.withColumn("r", row_number().over(wt))
        .filter(col("r") === 1 && col("margin") > 1.0)
        .select(col("q_id"), col("vec_id"), col("margin"))
        .orderBy("q_id")
    }),
    // Leading principal component by DETERMINISTIC power iteration —
    // the dimensionality-reduction primitive an embedding pipeline runs
    // before whitening/quantization (and the 1-D shadow of a full PCA:
    // top-k components = the same loop under deflation, same plan).
    // Each round is one corpus map (w_i = xc_i·v, a sequential per-row
    // fold) plus a per-position partial-agg sum (s_j = Σ_i w_i·xc_ij)
    // — k·dim rows shuffle per round, independent of corpus size,
    // exactly the kmeans update shape. Determinism: all per-row folds
    // are sequential (bit-identical to list_reduce); the ONLY cross-row
    // double sums (μ and s) are cast to FLOAT, which absorbs the
    // summation-order noise (the kmeansCtes precedent — analysis in
    // PLANS.md round-6); everything downstream of those floats is
    // bit-identical again. Init v0 = 1/√dim = 0.125 exactly.
    "embedding_pca" -> ((s, d) => {
      val e = emb(s, d)
      val muRow = e
        .select(posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("pos")).agg(avg(col("x").cast("double")).cast("float").as("mu"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("pm"))
        .select(transform(col("pm"), p => p.getField("mu")).as("mu"))
      val cent = e.select(col("vec_id"), col("label"), col("embedding"))
        .crossJoin(broadcast(muRow))
        .select(col("vec_id"), col("label"),
          zip_with(col("embedding"), col("mu"),
            (x, m) => x.cast("double") - m.cast("double")).as("xc"))
        .localCheckpoint() // read every round + for the final projection
      def dotSeq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      var vRow = muRow.select(transform(col("mu"), _ => lit(0.125)).as("v"))
      for (_ <- 1 to 3) {
        val sRow = cent.crossJoin(broadcast(vRow))
          .select(col("xc"), dotSeq(col("xc"), col("v")).as("w"))
          .select(col("w"), posexplode(col("xc")).as(Seq("pos", "xcj")))
          .groupBy(col("pos")).agg(sum(col("xcj") * col("w")).cast("float").as("sj"))
          .agg(array_sort(collect_list(struct(col("pos"), col("sj")))).as("ps"))
          .select(transform(col("ps"), p => p.getField("sj").cast("double")).as("sv"))
        vRow = sRow.select(
          transform(col("sv"),
            x => x / sqrt(aggregate(col("sv"), lit(0.0), (acc, v) => acc + v * v))).as("v"))
      }
      cent.crossJoin(broadcast(vRow))
        .select(col("vec_id"), col("label"),
          round(dotSeq(col("xc"), col("v")), 6).as("pc1"))
        .orderBy("vec_id")
    })
  )

  /** The embed_neardup demo body with its guard exposed for testing.
    * `maxBlock` bounds the per-label block size; the tiny per-label
    * count aggregate is broadcast back onto the pair join and checked
    * row-wise by `assert_true` inside a filter (a filter, not an unused
    * projection, so column pruning can't optimize the guard away).
    */
  def embedNearDupDemo(e: DataFrame, maxBlock: Int = 4096): DataFrame = {
    val blockSizes = e.groupBy(col("label")).agg(count(lit(1)).as("_block_n"))
    val a = e.select(col("vec_id").as("id_a"), col("label"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("id_b"), col("label"), col("embedding").as("emb_b"))
    a.join(broadcast(blockSizes), Seq("label"))
      .filter(assert_true(col("_block_n") <= maxBlock,
        concat(lit(s"embed_neardup is an O(block^2) DEMO: label block "),
          col("label"), lit(s" has "), col("_block_n"),
          lit(s" rows > bound $maxBlock — use embed_neardup_lsh at scale"))).isNull)
      .drop("_block_n")
      .join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .select(col("label"), col("id_a"), col("id_b"),
        VectorOps.cosineScore(col("emb_a"), col("emb_b")).as("cos"))
      .filter(col("cos") >= 0.3)
      .orderBy("id_a", "id_b")
  }

  private def cos(a: String, b: String) = VectorSql.cosineScore(a, b)
  // ranked-position scores: the Spark side projects rankedCosine (NaN →
  // -2.0), so the oracle must pin the same sentinel (ADVICE r14)
  private def rcos(a: String, b: String) = VectorSql.rankedCosineScore(a, b)

  val oracles: Map[String, String] = Map(
    "embedding_quantize" ->
      ("SELECT vec_id, round(maxabs, 6) AS scale6, " +
        "CAST(list_sum(q) AS BIGINT) AS q_sum, " +
        "CAST(list_min(q) AS BIGINT) AS q_min, CAST(list_max(q) AS BIGINT) AS q_max FROM (" +
        "SELECT vec_id, maxabs, " +
        "[CASE WHEN maxabs = 0 THEN 0 ELSE CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs + 0.5) AS BIGINT) END " +
        "for x in embedding] AS q FROM (" +
        "SELECT vec_id, embedding, list_reduce([greatest(0.0, abs(CAST(x AS DOUBLE))) for x in embedding], " +
        "(a, b) -> greatest(a, b)) AS maxabs FROM embeddings)) ORDER BY vec_id"),
    "k4_collection_info" ->
      ("SELECT label, count(*) AS n_points, " +
        "CAST(count(DISTINCT len(embedding)) AS BIGINT) AS n_dims_seen, " +
        "CAST(min(len(embedding)) AS INT) AS dim, " +
        "min(vec_id) AS min_id, max(vec_id) AS max_id " +
        "FROM embeddings GROUP BY label ORDER BY label"),
    "v1_cosine_topk" ->
      ("WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) " +
        s"SELECT e.vec_id, e.label, ${rcos("e.embedding", "q.qv")} AS score " +
        "FROM embeddings e, q WHERE e.vec_id <> 0 " +
        "ORDER BY score DESC, vec_id LIMIT 10"),
    "v2_filtered_topk" ->
      ("WITH q AS (SELECT embedding AS qv, label AS q_label FROM embeddings WHERE vec_id = 0) " +
        s"SELECT e.vec_id, e.label, ${rcos("e.embedding", "q.qv")} AS score " +
        "FROM embeddings e, q WHERE e.vec_id <> 0 AND e.label = q.q_label " +
        "ORDER BY score DESC, vec_id LIMIT 10"),
    // k+1 over-fetch FIRST (reference parity: the same-doc filter runs
    // on the already-limited sliver), then self-skip + cross-doc-only
    "v2_similar_chunks" ->
      ("WITH q AS (SELECT embedding AS qv, label AS q_doc FROM embeddings WHERE vec_id = 0), " +
        s"ov AS (SELECT e.vec_id, e.label, ${rcos("e.embedding", "q.qv")} AS score " +
        "FROM embeddings e, q ORDER BY score DESC, vec_id LIMIT 11) " +
        "SELECT o.vec_id, o.label, o.score FROM ov o, q " +
        "WHERE o.vec_id <> 0 AND o.label <> q.q_doc " +
        "ORDER BY score DESC, vec_id LIMIT 10"),
    "v2_search_by_doc" ->
      ("WITH v AS (SELECT e.vec_id, e.embedding, e.label, d.text, d.source " +
        "FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id), " +
        "q AS (SELECT embedding AS qv, text AS q_text FROM v WHERE vec_id = 0), " +
        "cand AS (SELECT v.vec_id, v.label, v.text, q.q_text, " +
        s"${rcos("v.embedding", "q.qv")} AS score " +
        "FROM v, q WHERE v.source = 'src3' " +
        "ORDER BY score DESC, vec_id LIMIT 25), " +
        "rr AS (SELECT vec_id, label, score, " +
        "round(CAST(len(list_intersect(tc, tq)) AS DOUBLE) / " +
        "len(list_distinct(list_concat(tc, tq))), 6) AS rerank_score FROM " +
        "(SELECT vec_id, label, score, " +
        "list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tc, " +
        "list_distinct(regexp_split_to_array(lower(trim(q_text)), '\\s+')) AS tq FROM cand)) " +
        "SELECT vec_id, label, score, rerank_score FROM rr " +
        "ORDER BY rerank_score DESC, score DESC, vec_id LIMIT 5"),
    "v3_rerank" ->
      ("WITH q0 AS (SELECT embedding AS qv0 FROM embeddings WHERE vec_id = 0), " +
        "q1 AS (SELECT embedding AS qv1 FROM embeddings WHERE vec_id = 1), " +
        "cand AS (SELECT e.vec_id, e.embedding, " +
        s"${rcos("e.embedding", "q0.qv0")} AS stage1_score " +
        "FROM embeddings e, q0 WHERE e.vec_id NOT IN (0, 1) " +
        "ORDER BY stage1_score DESC, vec_id LIMIT 50) " +
        s"SELECT c.vec_id, c.stage1_score, ${rcos("c.embedding", "q1.qv1")} AS rerank_score " +
        "FROM cand c, q1 ORDER BY rerank_score DESC, vec_id LIMIT 10"),
    "bitext_margin" ->
      ("WITH a AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings " +
        "WHERE vec_id % 2 = 0 AND vec_id < 100), " +
        "t AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1), " +
        s"scored AS (SELECT a.q_id, t.vec_id, ${cos("t.embedding", "a.qv")} AS score FROM t, a), " +
        "rk AS (SELECT q_id, vec_id, score, " +
        "row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rf, " +
        "row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, q_id) AS rb FROM scored), " +
        "fwd AS (SELECT q_id, round(sum(score), 6) AS sa FROM rk WHERE rf <= 4 GROUP BY q_id), " +
        "bwd AS (SELECT vec_id, round(sum(score), 6) AS sb FROM rk WHERE rb <= 4 GROUP BY vec_id), " +
        "m AS (SELECT s.q_id, s.vec_id, round(s.score * 8.0 / (f.sa + b.sb), 6) AS margin " +
        "FROM scored s JOIN fwd f ON s.q_id = f.q_id JOIN bwd b ON s.vec_id = b.vec_id), " +
        "top AS (SELECT q_id, vec_id, margin, " +
        "row_number() OVER (PARTITION BY q_id ORDER BY margin DESC, vec_id) AS r FROM m) " +
        "SELECT q_id, vec_id, margin FROM top WHERE r = 1 AND margin > 1.0 ORDER BY q_id"),
    "sim_knn_join" ->
      ("WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 20), " +
        "scored AS (SELECT q.q_id, e.vec_id, " +
        s"${cos("e.embedding", "q.qv")} AS score " +
        "FROM embeddings e, q WHERE e.vec_id >= 20), " +
        "ranked AS (SELECT q_id, vec_id, score, CAST(row_number() OVER " +
        "(PARTITION BY q_id ORDER BY score DESC, vec_id) AS INT) AS rnk FROM scored) " +
        "SELECT q_id, vec_id, rnk, score FROM ranked WHERE rnk <= 3 ORDER BY q_id, rnk"),
    "search_e2e" ->
      ("WITH v AS (SELECT e.vec_id, e.embedding, e.label, d.text " +
        "FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id), " +
        "acc AS (SELECT doc_id FROM documents WHERE lang IN ('en','de') " +
        "UNION SELECT doc_id FROM documents WHERE source = 'src_3'), " +
        "q AS (SELECT embedding AS qv, text AS q_text FROM v WHERE vec_id = 0), " +
        "cand AS (SELECT v.vec_id, v.label, v.text, q.q_text, " +
        s"${rcos("v.embedding", "q.qv")} AS score " +
        "FROM v, q WHERE v.vec_id <> 0 AND v.vec_id IN (SELECT doc_id FROM acc) " +
        "ORDER BY score DESC, vec_id LIMIT 50), " +
        "rr AS (SELECT vec_id, label, score, " +
        "round(CAST(len(list_intersect(tc, tq)) AS DOUBLE) / " +
        "len(list_distinct(list_concat(tc, tq))), 6) AS rerank_score FROM " +
        "(SELECT vec_id, label, score, " +
        "list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tc, " +
        "list_distinct(regexp_split_to_array(lower(trim(q_text)), '\\s+')) AS tq FROM cand)) " +
        "SELECT vec_id, label, score, rerank_score FROM rr " +
        "ORDER BY rerank_score DESC, score DESC, vec_id LIMIT 10"),
    "embed_neardup" ->
      ("SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b, " +
        s"${cos("a.embedding", "b.embedding")} AS cos " +
        "FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id " +
        s"WHERE ${cos("a.embedding", "b.embedding")} >= 0.3 " +
        "ORDER BY id_a, id_b"),
    "hard_negatives" ->
      ("WITH q AS (SELECT vec_id AS q_id, embedding AS qv, label AS q_label " +
        "FROM embeddings WHERE vec_id < 10), " +
        "scored AS (SELECT q.q_id, e.vec_id, e.label, " +
        s"${cos("e.embedding", "q.qv")} AS score " +
        "FROM embeddings e CROSS JOIN q " +
        "WHERE e.vec_id <> q.q_id AND e.label <> q.q_label), " +
        "ranked AS (SELECT q_id, vec_id, label, score, CAST(row_number() OVER " +
        "(PARTITION BY q_id ORDER BY score DESC, vec_id) AS INT) AS rnk FROM scored) " +
        "SELECT q_id, vec_id, label, rnk, score FROM ranked WHERE rnk <= 3 ORDER BY q_id, rnk"),
    "embedding_pca" -> pcaSql
  )

  /** Power-iteration replay (see the embedding_pca query comment): per
    * round, w is a sequential per-row fold (list_reduce ≡ aggregate for
    * sums) and s is the per-position cross-row sum cast to FLOAT — the
    * only summation-order-sensitive stage, absorbed by the cast exactly
    * as in kmeansCtes. v0 = 0.125 (1/√64, exactly representable).
    */
  private def pcaSql: String = {
    val dim = 64
    def dotSeq(a: String, b: String) =
      s"list_reduce([$a[i+1] * $b[i+1] for i in range($dim)], (x,y) -> x+y)"
    val head = Seq(
      s"mu AS (SELECT i, CAST(avg(CAST(embedding[i+1] AS DOUBLE)) AS FLOAT) AS mu " +
        s"FROM embeddings CROSS JOIN range($dim) t(i) GROUP BY i)",
      "muv AS (SELECT list(CAST(mu AS DOUBLE) ORDER BY i) AS mu FROM mu)",
      "cent AS MATERIALIZED (SELECT vec_id, label, " +
        s"[CAST(embedding[i+1] AS DOUBLE) - muv.mu[i+1] for i in range($dim)] AS xc " +
        "FROM embeddings, muv)",
      s"v0 AS (SELECT [0.125 for i in range($dim)] AS v)")
    val rounds = (1 to 3).flatMap { r =>
      Seq(
        s"w$r AS (SELECT vec_id, xc, ${dotSeq("xc", "v")} AS w FROM cent, v${r - 1})",
        s"s$r AS (SELECT i, CAST(sum(xc[i+1] * w) AS FLOAT) AS sj " +
          s"FROM w$r CROSS JOIN range($dim) t(i) GROUP BY i)",
        s"sv$r AS (SELECT list(CAST(sj AS DOUBLE) ORDER BY i) AS sv FROM s$r)",
        s"v$r AS MATERIALIZED (SELECT [sv[i+1] / sqrt(${dotSeq("sv", "sv")}) " +
          s"for i in range($dim)] AS v FROM sv$r)")
    }
    "WITH " + (head ++ rounds).mkString(", ") +
      s" SELECT vec_id, label, round(${dotSeq("xc", "v")}, 6) AS pc1 " +
      "FROM cent, v3 ORDER BY vec_id"
  }
}
