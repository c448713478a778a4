package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector math over `ArrayType(FloatType)` columns, built from native
  * Catalyst higher-order functions so Catalyst can prune/push around them
  * and no Scala UDF boxing appears on the hot path.
  *
  * Reference semantics: Qdrant collections use COSINE distance
  * (reference: frappe_data_pipelines/services/qdrant_service.py:80-84);
  * dense top-k search is services/qdrant_service.py:117-154.
  *
  * Determinism note: products and sums are computed sequentially in
  * double precision (aggregate folds left-to-right), which matches the
  * DuckDB oracle's `list_reduce` fold bit-for-bit — required because the
  * correctness harness hash-compares rounded scores.
  */
object VectorOps {

  /** Sequential double-precision dot product of two float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 norm (double, sequential). */
  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** Cosine similarity in [-1, 1] via the codegen'd Catalyst expression
    * ([[graft.expressions.CosineSimilarity]]; registered by
    * `Tables.embeddings` / `GraftExtensions`). Numerically identical to
    * `dot/(sqrt(norm2)*sqrt(norm2))` built from the folds above.
    */
  def cosine(a: Column, b: Column): Column =
    call_function(graft.expressions.GraftFunctions.CosineName, a, b)

  /** Fold-built cosine (interpreted HOFs) — kept as the reference
    * implementation the codegen expression is tested against.
    */
  def cosineViaFolds(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Cosine rounded for stable cross-engine comparison/ordering. */
  def cosineScore(a: Column, b: Column, scale: Int = 6): Column =
    round(cosine(a, b), scale)

  /** [[cosineScore]] for RANKING positions: a zero-norm vector (or
    * query) scores 0/0 = NaN, and Spark orders NaN ABOVE every double —
    * one degenerate row would sit at rank 1 of every top-k (review
    * finding r14; the same guard SearchService.denseTopK carries).
    * NaN pins to -2.0, below the entire cosine range, so degenerate
    * rows rank LAST deterministically. Use in `orderBy(desc)`/top-k
    * positions; plain [[cosineScore]] stays the metric twin of the
    * DuckDB oracle for outputs and symmetric comparisons.
    */
  def rankedCosine(a: Column, b: Column, scale: Int = 6): Column =
    nanvl(cosineScore(a, b, scale), lit(-2.0))

  /** L2 norm (double, sequential fold). */
  def norm(a: Column): Column = sqrt(norm2(a))

  /** Max |component| of `c` after dividing by norm `n` — the symmetric
    * int8 quantization scale of the NORMALIZED vector (full use of the
    * int8 range). greatest-fold over abs() values only, so the 0.0 seed
    * is the fold's identity (cross-engine parity note in AnnQueries).
    */
  def maxNormed(c: Column, n: Column): Column =
    aggregate(c, lit(0.0), (a, v) => greatest(a, abs(v.cast("double") / n)))

  /** Symmetric int8 code of `c` given norm `n` and scale `m`:
    * floor(x/n/m·127 + 0.5) — floor form because Spark and DuckDB
    * disagree on half-way round(). ONE definition behind the inline
    * queries (ann_int8_topk, ann_ivf_int8) and the stored codes in
    * [[graft.operators.AnnIndex]]; the RAW-storage variant of the same
    * trick is VectorQueries' embedding_quantize — change the rounding
    * form in ALL of them or none.
    */
  def int8Code(c: Column, n: Column, m: Column): Column =
    transform(c, v => floor(v.cast("double") / n / m * lit(127.0) + lit(0.5)))

  /** THE int8 candidate-ranking tail shared by every int8 search path —
    * the inline `ann_ivf_int8` query and the stored-code searches of
    * both index families ([[graft.operators.AnnIndex.searchInt8]],
    * [[graft.operators.AnnLshIndex.searchInt8]]) — so the ranking can
    * never drift between inline and stored forms. `cands` carries
    * (vec_id, pq, sp) plus the join keys; `probes` (broadcast — it is
    * queries × probes, always tiny next to the corpus) carries (q_id,
    * qq, sq) plus the same keys. Candidates are ranked per query by the
    * EXACT integer dot of the int8 codes rescaled by the two stored
    * scales; the integer dot is bit-exact in any engine, which is what
    * keeps the whole ranking hash-oracle-able.
    */
  def rankInt8(cands: DataFrame, probes: DataFrame, joinCols: Seq[String],
               k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("score8").desc, col("vec_id"))
    cands.join(broadcast(probes), joinCols)
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("idot",
        aggregate(zip_with(col("pq"), col("qq"), (a, b) => a * b), lit(0L), (a, v) => a + v)
          .cast("long"))
      .withColumn("score8", round(col("idot").cast("double") * col("sp") * col("sq"), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("vec_id"), col("rnk"), col("idot"), col("score8"))
  }
}

/** DuckDB-dialect SQL snippets equivalent to [[VectorOps]], used to build
  * the oracle strings. `list_reduce` folds left-to-right like Spark's
  * `aggregate`, so scores match bit-for-bit before rounding.
  */
object VectorSql {
  def dot(a: String, b: String, dim: Int): String =
    s"list_reduce([CAST($a[i+1] AS DOUBLE)*CAST($b[i+1] AS DOUBLE) for i in range($dim)], (x,y)->x+y)"

  def cosine(a: String, b: String, dim: Int = 64): String =
    s"(${dot(a, b, dim)} / (sqrt(${dot(a, a, dim)}) * sqrt(${dot(b, b, dim)})))"

  def cosineScore(a: String, b: String, dim: Int = 64, scale: Int = 6): String =
    s"round(${cosine(a, b, dim)}, $scale)"

  /** Mirror of [[VectorOps.rankedCosine]]'s NaN→-2.0 pin (ADVICE r14):
    * a zero-norm vector scores 0/0, which is NaN in Spark and NULL in
    * DuckDB — `coalesce` pins the DuckDB side to the same -2.0 sentinel
    * so an oracle-gated query projecting the ranked score stays
    * hash-identical if a zero-norm embedding ever enters the corpus.
    * (A NULL *embedding column* would also coalesce here while Spark's
    * nanvl keeps NULL — acceptable: the embeddings table is generated
    * non-null, and the divergence would be a loud hash diff, not a
    * silent wrong ranking.)
    */
  def rankedCosineScore(a: String, b: String, dim: Int = 64, scale: Int = 6): String =
    s"coalesce(${cosineScore(a, b, dim, scale)}, -2.0)"

  /** [[graft.pipeline.Md5ProjectionEmbedder]]'s pre-normalization
    * component list, bit-exact: 8 hex chars of `md5((j/4) + ":" + text)`
    * as an exact integer < 2^32 (exact in double), divided by 2^31 (a
    * power of two — exact), minus 1. One md5 per component here (the
    * Scala twin reuses each digest for 4 components) — same values,
    * oracle-side cost only.
    */
  def md5ProjComponents(textExpr: String, dim: Int = 64): String =
    s"[('0x' || substr(md5(CAST(j // 4 AS VARCHAR) || ':' || $textExpr), " +
      s"(j % 4) * 8 + 1, 8))::BIGINT / 2147483648.0 - 1.0 for j in range($dim)]"

  /** Unit-normalize a [[md5ProjComponents]] list `x` to the FLOAT[]
    * embedding: sequential list_reduce norm (mirrors the Scala while
    * loop), then round-to-nearest float cast — both engines agree
    * bit-for-bit.
    */
  def md5ProjNormalize(x: String): String =
    s"[CAST(v / sqrt(list_reduce([y * y for y in $x], (a, b) -> a + b)) AS FLOAT) for v in $x]"
}
