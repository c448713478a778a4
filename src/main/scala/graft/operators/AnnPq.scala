package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the third compression lever of the ANN
  * suite, next to IVF pruning (read fewer vectors) and int8 scalar codes
  * (read 4x smaller vectors): PQ stores M=4 one-byte codebook indices
  * per vector (4 bytes vs the 256-byte float[64] — 64x), and queries
  * rank candidates with Asymmetric Distance Computation: one tiny
  * query-side lookup table of subspace dot products, then each
  * candidate's score is M table lookups and a fixed-order sum. The
  * scan side never touches the embedding column at all.
  *
  * Scale shape: encoding is a per-row map stage against the BROADCAST
  * codebooks (M·K = 32 rows) followed by a per-vector argmin — one
  * shuffle of (vec_id, m, j, d2) slivers, done ONCE at index-build time
  * (the codes are what a store persists, exactly like AnnIndex's int8
  * codes). Search is codes × broadcast LUT — embarrassingly parallel,
  * no exchange of the corpus, TakeOrderedAndProject-style top-k per
  * query. At 100 TB PQ composes with IVF the same way int8 does
  * (ann_ivf_int8): probe cells first, ADC-rank inside the cells.
  *
  * Determinism contract (the oracle gate): subspace distances are raw
  * sequential double folds (bit-identical to DuckDB's list_reduce, no
  * rounding needed for comparisons); LUT weights are scaled to INTEGERS
  * (floor(dot·1e6 + 0.5)) so the ADC score is an exact BIGINT in both
  * engines — the "integer-only scoring" discipline of rankInt8.
  * Codebooks are the deterministic stand-in slice (vec_id 100-107, the
  * ann_ivf_topk convention); the TRAINED path would run
  * [[AnnIndex.kmeans]] per subspace over sliced subvectors — same loop,
  * same seam, deliberately not duplicated here.
  */
object AnnPq {
  /** Subspaces × entries: 4 subspaces of 16 dims, 8 codes each. */
  val M = 4
  val SubDim = 16
  val K = 8

  private def subspaces: Column = explode(sequence(lit(0), lit(M - 1)))

  private def subvec(emb: Column, m: Column): Column =
    slice(emb, m * SubDim + 1, lit(SubDim))

  /** Raw sequential-fold squared L2 between two float subvectors. */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Stand-in codebooks (m, j, cb): subvectors of embeddings at ids
    * `baseId..baseId+K-1` — K=8 entries per subspace, the same
    * deterministic slice convention as [[AnnIndex.centroids]].
    *
    * `baseId` matters when the input is a RESIDUAL relation: the
    * default slice (100..107) is a subset of the centroid slice
    * (100..115), and a centroid vector's own residual is exactly zero —
    * 8 all-zero codebook entries make the whole ADC path degenerate
    * (every code 0, every LUT weight 0). Residual callers must pick a
    * slice DISJOINT from the centroids (review finding, r10 session 4;
    * AnnPqSpec pins non-degeneracy).
    */
  def codebooks(e: DataFrame, baseId: Long = 100L): DataFrame =
    e.filter(col("vec_id").between(baseId, baseId + K - 1))
      .select((col("vec_id") - baseId).cast("int").as("j"), col("embedding"))
      .select(col("j"), subspaces.as("m"), col("embedding"))
      .select(col("m"), col("j"), subvec(col("embedding"), col("m")).as("cb"))

  /** PQ codes, wide form (vec_id, c0..c3): per subspace, the codebook
    * entry with the smallest squared L2 to the subvector (ties toward
    * the smaller entry id via the struct-min).
    */
  def encode(e: DataFrame, cbs: DataFrame): DataFrame = {
    val codes = e
      .select(col("vec_id"), subspaces.as("m"), col("embedding"))
      .select(col("vec_id"), col("m"), subvec(col("embedding"), col("m")).as("sv"))
      .join(broadcast(cbs), Seq("m"))
      .select(col("vec_id"), col("m"), struct(l2sq(col("sv"), col("cb")).as("d2"), col("j")).as("cand"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(col("cand")).as("best"))
      .select(col("vec_id"), col("m"), col("best.j").as("code"))
    val codeCols = (0 until M).map(m =>
      max(when(col("m") === m, col("code"))).as(s"c$m"))
    codes.groupBy(col("vec_id")).agg(codeCols.head, codeCols.tail: _*)
  }

  /** Query-side ADC lookup tables, wide form (q_id, ws0..ws3): ws{m} is
    * the K-entry array of INTEGER weights floor(dot(q_m, cb_{m,j})·1e6
    * + 0.5), ordered by entry id.
    */
  def lut(queries: DataFrame, cbs: DataFrame): DataFrame = {
    val w = queries
      .select(col("q_id"), subspaces.as("m"), col("qv"))
      .select(col("q_id"), col("m"), subvec(col("qv"), col("m")).as("qs"))
      .join(broadcast(cbs), Seq("m"))
      .select(col("q_id"), col("m"), col("j"),
        floor(graft.functions.VectorOps.dot(col("qs"), col("cb")) * lit(1e6) + lit(0.5))
          .cast("long").as("wq"))
      .groupBy(col("q_id"), col("m"))
      .agg(transform(array_sort(collect_list(struct(col("j"), col("wq")))),
        e => e.getField("wq")).as("ws"))
    val wsCols = (0 until M).map(m =>
      max(when(col("m") === m, col("ws"))).as(s"ws$m"))
    w.groupBy(col("q_id")).agg(wsCols.head, wsCols.tail: _*)
  }

  private def adcExpr: Column =
    (0 until M).map(m => element_at(col(s"ws$m"), col(s"c$m") + 1)).reduce(_ + _)

  /** ADC top-k: every (query, candidate) pair scored by M integer table
    * lookups summed in fixed order — exact BIGINT, hash-stable. The
    * codes table stands in for the persisted index; the LUT side is
    * queries-sized and broadcast.
    */
  def search(e: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val cbs = codebooks(e)
    searchCodes(encode(e, cbs), lut(queries, cbs), k)
  }

  /** The ADC ranking over an ALREADY-ENCODED codes relation — shared by
    * the inline [[search]] (codes derived in-plan) and
    * [[AnnPqStore.search]] (codes read from the persisted store), so
    * the two backings can never drift on the scoring.
    */
  def searchCodes(codes: DataFrame, luts: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc").desc, col("vec_id"))
    codes.crossJoin(broadcast(luts))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adc", adcExpr.cast("long"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), col("rnk"), col("adc"))
  }

  /** IVF × PQ (the FAISS IVFADC composition): `codesWithCell` carries
    * (vec_id, cell, c0..c{M-1}) — the persisted inverted file with PQ
    * codes instead of raw vectors; `probeLuts` carries (q_id, cell,
    * ws0..ws{M-1}) — each query's LUT replicated over its nprobe probed
    * cells (queries × nprobe rows, always broadcastable). The cell
    * equi-join IS the pruning: only candidates in probed cells are ADC-
    * scored, and the scan side never exchanges.
    */
  def searchInCells(codesWithCell: DataFrame, probeLuts: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc").desc, col("vec_id"))
    codesWithCell.join(broadcast(probeLuts), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adc", adcExpr.cast("long"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), col("rnk"), col("adc"))
  }

  /** Residual IVFADC (the full Jégou et al. §IV / FAISS IVFADC form):
    * codes quantize the RESIDUAL x − c(x) rather than x, and the score
    * decomposes as q·x ≈ q·c(cell) + q·r̂ — so `probeLuts` carries one
    * extra integer column `wc` = floor(q·centroid·1e6 + 0.5) per probed
    * cell, added to the same M table lookups. On clustered corpora
    * residuals are smaller than raw vectors, so the K codebook entries
    * resolve them more finely — the reason FAISS encodes residuals
    * whenever an IVF level exists (measured caveat for THIS corpus in
    * the ann_ivf_pq_residual query comment: uniform random vectors
    * don't cluster, so the subtraction inflates them instead). Same
    * join shape, same integer-exact scoring.
    */
  def searchInCellsResidual(codesWithCell: DataFrame, probeLuts: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc").desc, col("vec_id"))
    codesWithCell.join(broadcast(probeLuts), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adc", (col("wc") + adcExpr).cast("long"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), col("rnk"), col("adc"))
  }
}
