package graft.operators

import graft.Tables
import graft.functions.{KmvAggregator, TextOps, TextSql}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-size corpus sketches — the fixed-memory summaries a 100 TB
  * pass maintains where exact answers would need corpus-sized state:
  *
  *  - `distinct_kmv`: K-Minimum-Values distinct-count sketch (Bar-Yossef
  *    et al. 2002; Beyer et al. 2007) of each source's shingle set,
  *    audited against the exact distinct count. This is the principled,
  *    cross-engine-exact stand-in for `approx_count_distinct` (Spark's
  *    HLL++ cannot be replayed in another engine; the K-th order
  *    statistic of md5 prefixes can).
  *  - `heavy_hitters_cms`: Count-Min sketch (Cormode & Muthukrishnan
  *    2005) over corpus token frequencies, audited against exact counts
  *    for the top-K tokens. The sketch never undercounts; the overcount
  *    column is the collision-pressure signal that says when to widen.
  *  - `token_entropy`: per-source unigram Shannon entropy + type-token
  *    ratio — the diversity corpus card (a templated/boilerplate source
  *    shows low normalized entropy long before eyeballing finds it).
  *
  * All three are single-corpus-pass partial aggregates: the only state
  * crossing the wire is sketch-sized (≤K longs per group, d·w cells,
  * one row per (source, token)). Every number is either integer-exact
  * or a 6dp-rounded double (the lm_score float discipline), so all
  * three queries sit behind the DuckDB hash gate.
  */
object SketchQueries {
  type Q = (SparkSession, String) => DataFrame

  /** 60-bit hash: first 15 hex chars of md5 as a BIGINT. 15 (not 16)
    * keeps the value unsigned-safe in a signed 64-bit lane in BOTH
    * engines; 2^60 of headroom is far below any collision concern at
    * the sketch sizes involved.
    */
  private def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  private val Hash60Max = 1152921504606846976.0 // 2^60, exact as a double

  private def hash60Sql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  // Count-Min geometry: d hash rows × w buckets. w divides 2^16 so the
  // 4-hex-digit md5 prefix mod w is uniform.
  private val CmsRows = 4
  private val CmsWidth = 512
  private val CmsTopK = 20

  /** CMS bucket of `tok` under hash row `r` (distinct salts = the d
    * pairwise-independent hash functions of the construction).
    */
  private def cmsBucket(r: Int, tok: Column): Column =
    conv(substring(md5(concat(lit(s"$r:"), tok).cast("binary")), 1, 4), 16, 10)
      .cast("long") % CmsWidth

  private def cmsBucketSql(r: String, tok: String): String =
    s"('0x' || substr(md5($r || ':' || $tok), 1, 4))::BIGINT % $CmsWidth"

  /** One (r, b) bucket row per CMS hash row for `tok`, exploded — the
    * shared projection behind the cells and candidate subtrees (one
    * definition, so sketch geometry / salt format can never drift
    * between them).
    */
  private def cmsRowBuckets(tok: Column): Column =
    explode(array((0 until CmsRows).map(r =>
      struct(lit(r).as("r"), cmsBucket(r, tok).as("b"))): _*))

  /** Per-source (source, shingle) relation — the input both sides of the
    * KMV audit derive from. Shingles are per-doc distinct out of the UDF;
    * cross-doc duplicates are deduped by the consumers (the aggregator by
    * hash value, the exact side by countDistinct).
    */
  private def sourceShingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), explode(TextOps.shingles3Udf(col("text"))).as("sh"))

  /** KMV estimate column: exact below K (the kept set IS the distinct
    * set), (K−1)·2^60 / h_K at K. The numerator (K−1)·2^60 = 2^60·63 is
    * exactly representable as a double, so the whole estimate is ONE
    * correctly-rounded IEEE division + floor — bit-identical cross-engine.
    */
  private def kmvEstimate(nKept: Column, kth: Column): Column =
    when(nKept < KmvAggregator.K, nKept.cast("long"))
      .otherwise(floor(lit((KmvAggregator.K - 1) * Hash60Max) / kth.cast("double")).cast("long"))

  /** The PRODUCTION sketch plan: one corpus pass ending in a partial
    * aggregate whose state is ≤K longs per (source, partition), then one
    * sketch-sized exchange keyed on source. Deliberately NOT fused with
    * the exact audit below — a countDistinct in the same agg forces
    * Catalyst onto the distinct-aggregate path, which exchanges the
    * corpus-sized (source, shingle) relation and erases exactly the
    * property the sketch buys (observed: the fused plan shuffles every
    * shingle; this one ships 64 longs per source). SketchSpec pins the
    * shape: the only exchange below the sketch agg is on `source`.
    */
  def kmvSketch(shingled: DataFrame): DataFrame = {
    val kmv = udaf(KmvAggregator)
    shingled.groupBy(col("source")).agg(kmv(hash60(col("sh"))).as("kept"))
  }

  /** The estimate projection over a (source, kept) sketch relation —
    * shared verbatim between the inline query and [[DistinctSketch]]'s
    * stored path (one definition, two backings).
    */
  def kmvEstimates(sketch: DataFrame): DataFrame =
    sketch.select(col("source"),
      size(col("kept")).as("n_kept"),
      element_at(col("kept"), -1).as("kth_h"),
      kmvEstimate(size(col("kept")), element_at(col("kept"), -1)).as("est_distinct"))

  def queries: Map[String, Q] = Map(
    // Per-source distinct-shingle cardinality: KMV sketch vs exact.
    // Scale: the sketch subtree is the product (see kmvSketch); the exact
    // side (countDistinct, corpus-sized exchange) is the AUDIT and is
    // what you drop at 100 TB. Both sides are source-keyed aggregates of
    // the same shingle relation joined on the ~|sources|-row result.
    "distinct_kmv" -> ((s, d) => {
      val exact = sourceShingles(s, d).groupBy(col("source"))
        .agg(countDistinct(col("sh")).as("exact_distinct"))
      kmvEstimates(kmvSketch(sourceShingles(s, d)))
        .join(broadcast(exact), Seq("source"))
        .orderBy("source")
    }),

    // Corpus heavy hitters: exact top-20 tokens audited against their
    // Count-Min estimates. The batch factoring goes THROUGH the exact
    // wordcount (cells = bucket-sum of token counts — associativity makes
    // it equal to per-occurrence increments), so the corpus is scanned
    // once and the sketch is derived from the vocab-sized relation; the
    // streaming form increments cells directly with the same result.
    "heavy_hitters_cms" -> ((s, d) => {
      // Pin the vocab-sized wordcount: both the cells and the candidates
      // derive from it, and without materialization Catalyst re-plans the
      // corpus explode+agg once per consumer (the BoundedRank argument —
      // measured 2× the scan cost at sf0.1). localCheckpoint stores
      // blocks UNREPLICATED on executors — fine single-JVM, but on a
      // real cluster a lost executor fails the query instead of
      // recomputing; the production substitute for this pin (here and
      // in the recall/plane/edit-rate curve queries that reuse the
      // pattern) is persist(DISK_ONLY) or a reliable checkpoint.
      val wc = Tables.documents(s, d)
        .select(explode(TextOps.tokens(lower(col("text")))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val cells = wc
        .select(col("cnt"), cmsRowBuckets(col("tok")).as("rb"))
        .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
        .agg(sum(col("cnt")).as("cell"))
      val cand = wc.orderBy(col("cnt").desc, col("tok")).limit(CmsTopK)
      cand
        .select(col("tok"), col("cnt"), cmsRowBuckets(col("tok")).as("rb"))
        .join(broadcast(cells),
          col("rb.r") === cells("r") && col("rb.b") === cells("b"))
        .groupBy(col("tok"), col("cnt"))
        .agg(min(col("cell")).as("cms_est"))
        .select(col("tok"), col("cnt").as("exact_cnt"), col("cms_est"),
          (col("cms_est") - col("cnt")).as("overcount"))
        .orderBy(col("exact_cnt").desc, col("tok"))
    }),

    // Quantile sketch — the third leg of the sketch trio (cardinality /
    // frequency / quantiles): per-source doc-length quantiles (p50,
    // p90, p99) from a BOUNDED 64-bin integer histogram, audited
    // against the exact rank statistic. Why a fixed-bin histogram and
    // not GK/t-digest: those summaries are insertion-order-dependent,
    // so they can never pass a cross-engine hash gate; integer bin
    // counts are a commutative monoid (mergeable across shards and
    // batches like the KMV sketch) and the quantile read-out is pure
    // integer arithmetic. Rank r = ceil(q·n) computed as
    // (q·n + 99) div 100 — no float ceil. The estimate is the upper
    // edge of the first bin whose cumulative count reaches r, so
    // 1 ≤ est − exact ≤ binWidth below the top bin (spec-pinned); a
    // quantile in the open-ended top bin reports NULL + overflow=true
    // (see lengthQuantiles). The exact side is a per-source rank window
    // over the corpus — the AUDIT you drop at 100 TB; the histogram
    // subtree is the product.
    "length_quantiles" -> ((s, d) => lengthQuantiles(Tables.documents(s, d))),

    // Per-source token diversity card: Shannon entropy of the unigram
    // distribution, normalized entropy, type-token ratio.
    // H = ln N − (Σ c·ln c)/N : integer counts inside, one rounded
    // division chain outside, 6dp round absorbing the Σ-order jitter.
    "token_entropy" -> ((s, d) => {
      val c = Tables.documents(s, d)
        .select(col("source"), explode(TextOps.tokens(lower(col("text")))).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      val h = log(col("n_tokens").cast("double")) -
        col("sclc") / col("n_tokens").cast("double")
      c.groupBy(col("source"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("vocab"),
          sum(col("c").cast("double") * log(col("c").cast("double"))).as("sclc"))
        .select(col("source"), col("n_tokens"), col("vocab"),
          round(h, 6).as("entropy"),
          when(col("vocab") > 1,
            round(h / log(col("vocab").cast("double")), 6)).as("norm_entropy"),
          round(col("vocab").cast("double") / col("n_tokens").cast("double"), 6).as("ttr"))
        .orderBy("source")
    }))

  /** The quantile-sketch body over any (source, text) relation — see the
    * `length_quantiles` query comment. The TOP bin is open-ended: a
    * quantile landing there reports est_upper NULL + overflow=true
    * instead of a silently-capped value (review finding: `least(bin,
    * B−1)` alone caps every ≥B·W-word estimate at B·W with unbounded
    * error — the "1 ≤ est − exact ≤ W" bracket only holds BELOW the top
    * bin, and SketchSpec pins both regimes).
    */
  /** length_quantiles histogram geometry — object-level so the DuckDB
    * oracle interpolates the SAME constants (review finding r15: the
    * oracle previously hardcoded 8/63 literals in four places, so
    * retuning the Spark side would leave it silently stale until a
    * runtime gate failure).
    */
  private[operators] val QuantW = 8L
  private[operators] val QuantB = 64

  def lengthQuantiles(docs: DataFrame): DataFrame = {
    val W = QuantW; val B = QuantB
    val v = docs.select(col("source"), TextOps.wordCount(col("text")).as("v"))
    val hist = v
      .select(col("source"), least(expr(s"v div $W"), lit(B - 1L)).as("bin"))
      .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("bin"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val ranks = v.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .select(col("source"), col("n_docs"),
        explode(array(lit(50L), lit(90L), lit(99L))).as("q"))
      .withColumn("r", expr("(q * n_docs + 99) div 100"))
    val est = ranks.join(cum, Seq("source"))
      .filter(col("cum") >= col("r"))
      .groupBy(col("source"), col("q"), col("n_docs"), col("r"))
      .agg(min(col("bin")).as("qbin"))
      .select(col("source"), col("q"), col("n_docs"), col("r"),
        when(col("qbin") < B - 1L, (col("qbin") + 1) * W).as("est_upper"),
        (col("qbin") === B - 1L).as("overflow"))
    // the exact side renames its key pre-join: both sides descend from
    // the same scan, and a same-name join condition on shared lineage
    // makes Spark warn about a trivially-true predicate
    val exact = v.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("v"))))
      .select(col("source").as("src_e"), col("rn"), col("v"))
    est.join(exact, col("source") === col("src_e") && col("rn") === col("r"))
      .select(col("source"), col("q"), col("n_docs"), col("est_upper"),
        col("v").as("exact_value"), col("overflow"))
      .orderBy(col("source"), col("q"))
  }

  private val K = KmvAggregator.K

  val oracles: Map[String, String] = Map(
    "distinct_kmv" ->
      (s"WITH sh AS (SELECT source, unnest(${TextSql.shingles("toks")}) AS sh FROM " +
        s"(SELECT source, ${TextSql.tokens("text")} AS toks FROM documents)), " +
        s"h AS (SELECT DISTINCT source, ${hash60Sql("sh")} AS h FROM sh), " +
        "ex AS (SELECT source, CAST(count(DISTINCT sh) AS BIGINT) AS exact_distinct FROM sh GROUP BY source), " +
        "r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h), " +
        s"kk AS (SELECT source, CAST(least(count(*), $K) AS INT) AS n_kept, " +
        s"max(h) FILTER (rn <= $K) AS kth_h FROM r GROUP BY source) " +
        "SELECT kk.source, kk.n_kept, kk.kth_h, " +
        s"CASE WHEN kk.n_kept < $K THEN CAST(kk.n_kept AS BIGINT) " +
        s"ELSE CAST(floor(${(K - 1).toDouble} * $Hash60Max / kk.kth_h) AS BIGINT) END AS est_distinct, " +
        "ex.exact_distinct FROM kk JOIN ex ON kk.source = ex.source ORDER BY kk.source"),
    "heavy_hitters_cms" ->
      (s"WITH tk AS (SELECT unnest(${TextSql.tokens("lower(text)")}) AS tok FROM documents), " +
        "wc AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY tok), " +
        s"cells AS (SELECT t.r, ${cmsBucketSql("t.r::VARCHAR", "wc.tok")} AS b, " +
        s"CAST(sum(wc.cnt) AS BIGINT) AS cell FROM wc, unnest(range($CmsRows)) t(r) GROUP BY 1, 2), " +
        s"cand AS (SELECT tok, cnt FROM wc ORDER BY cnt DESC, tok LIMIT $CmsTopK) " +
        "SELECT c.tok, c.cnt AS exact_cnt, CAST(min(cl.cell) AS BIGINT) AS cms_est, " +
        "CAST(min(cl.cell) - c.cnt AS BIGINT) AS overcount " +
        s"FROM cand c, unnest(range($CmsRows)) t(r), cells cl WHERE cl.r = t.r " +
        s"AND cl.b = ${cmsBucketSql("t.r::VARCHAR", "c.tok")} " +
        "GROUP BY 1, 2 ORDER BY exact_cnt DESC, tok"),
    "length_quantiles" ->
      (s"WITH v AS (SELECT source, CAST(len(${TextSql.tokens("text")}) AS BIGINT) AS v FROM documents), " +
        s"hist AS (SELECT source, least(v // $QuantW, ${QuantB - 1}) AS bin, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2), " +
        "cum AS (SELECT source, bin, sum(cnt) OVER (PARTITION BY source ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum FROM hist), " +
        "ranks AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, q, (q * count(*) + 99) // 100 AS r " +
        "FROM v, unnest([CAST(50 AS BIGINT), CAST(90 AS BIGINT), CAST(99 AS BIGINT)]) t(q) GROUP BY source, q), " +
        "est AS (SELECT ranks.source, ranks.q, ranks.n_docs, ranks.r, " +
        s"CASE WHEN min(cum.bin) < ${QuantB - 1} THEN CAST((min(cum.bin) + 1) * $QuantW AS BIGINT) END AS est_upper, " +
        s"min(cum.bin) = ${QuantB - 1} AS overflow " +
        "FROM ranks JOIN cum ON ranks.source = cum.source AND cum.cum >= ranks.r " +
        "GROUP BY 1, 2, 3, 4), " +
        "ex AS (SELECT source, row_number() OVER (PARTITION BY source ORDER BY v) AS rn, v FROM v) " +
        "SELECT est.source, est.q, est.n_docs, est.est_upper, ex.v AS exact_value, est.overflow " +
        "FROM est JOIN ex ON est.source = ex.source AND ex.rn = est.r " +
        "ORDER BY est.source, est.q"),
    "token_entropy" ->
      (s"WITH tk AS (SELECT source, unnest(${TextSql.tokens("lower(text)")}) AS tok FROM documents), " +
        "c AS (SELECT source, tok, count(*) AS c FROM tk GROUP BY 1, 2), " +
        "a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, CAST(count(*) AS BIGINT) AS vocab, " +
        "sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS sclc FROM c GROUP BY source) " +
        "SELECT source, n_tokens, vocab, " +
        "round(ln(CAST(n_tokens AS DOUBLE)) - sclc / n_tokens, 6) AS entropy, " +
        "CASE WHEN vocab > 1 THEN round((ln(CAST(n_tokens AS DOUBLE)) - sclc / n_tokens) / ln(CAST(vocab AS DOUBLE)), 6) END AS norm_entropy, " +
        "round(CAST(vocab AS DOUBLE) / n_tokens, 6) AS ttr " +
        "FROM a ORDER BY source"))
}
