package graft.operators

import graft.Tables
import graft.functions.{TextOps, TextSql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distribution-divergence corpus cards — the audits that compare token
  * DISTRIBUTIONS rather than token sets:
  *
  *  - `domain_kl`: per-source KL(P_source ‖ P_corpus) over add-one
  *    smoothed unigram distributions — the domain-relevance /
  *    distinctiveness signal behind DoReMi-family mixture reweighting
  *    (Xie et al. 2023) and the "is this source just more of the same"
  *    question a mixing decision asks. A source whose KL ≈ 0 duplicates
  *    the corpus mixture; a high-KL source contributes novel mass.
  *  - `token_drift`: Jensen-Shannon top movers between two corpus
  *    snapshots (here the train/held-out hash splits as the two
  *    snapshots): which tokens moved probability mass, ranked by their
  *    JSD contribution. This is the drift monitor a production pipeline
  *    runs on every crawl increment before mixing it in — vocabulary
  *    drift shows up here long before downstream eval drops.
  *
  * Scale shape: both factor through the per-key count aggregates (one
  * corpus scan each), and every divergence term is a PER-ROW formula of
  * integer counts — the only cross-row float sum is the final per-source
  * KL reduction, absorbed by the 6dp round (lm_score discipline). The
  * grid relations are (sources × vocab) and (vocab) — vocab-sized, never
  * corpus-sized; at 100 TB the vocab agg shuffles on the token key and
  * the |sources|-row side broadcasts.
  *
  * Ranking in `token_drift` orders by the UNROUNDED contribution: it is
  * a deterministic per-row double chain of identical integer inputs in
  * both engines (the dsir_select precedent), with the token as total
  * tiebreak.
  */
object DriftQueries {
  type Q = (SparkSession, String) => DataFrame

  // the single shared split formula (review finding: a private copy here
  // risked silently diverging from the split the datasheet documents)
  private def hashBucket(id: org.apache.spark.sql.Column) = TextOps.hashBucket(id)
  private val bucketSql = TextSql.bucketSql()

  /** KL(P_s ‖ P_c) summed over the FULL corpus vocab (smoothing gives
    * every source mass on unseen tokens): grid = vocab × broadcast
    * per-source totals, counts left-joined in, one per-source sum.
    * Both smoothed measures are proper distributions over the same
    * vocab, so every reported KL is ≥ 0 (Gibbs) — spec-pinned, and a
    * single-source corpus is exactly 0.
    */
  def domainKl(docs: DataFrame): DataFrame = {
    val tk = docs
      .select(col("source"), explode(TextOps.tokens(lower(col("text")))).as("tok"))
    val sc = tk.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cs"))
    val vc = tk.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val ns = sc.groupBy(col("source"))
      .agg(sum(col("cs")).as("n_s"), count(lit(1)).as("vocab_seen"))
    val scalars = vc.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    val ps = (coalesce(col("cs"), lit(0L)) + 1).cast("double") /
      (col("n_s") + col("v")).cast("double")
    val pc = (col("c") + 1).cast("double") / (col("n") + col("v")).cast("double")
    vc.crossJoin(broadcast(ns))
      .join(sc, Seq("source", "tok"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("source"), col("n_s"), col("vocab_seen"),
        (ps * log(ps / pc)).as("term"))
      .groupBy(col("source"), col("n_s"), col("vocab_seen"))
      .agg(round(sum(col("term")), 6).as("kl_to_corpus"))
      .select(col("source"), col("n_s").as("n_tokens"), col("vocab_seen"),
        col("kl_to_corpus"))
      .orderBy("source")
  }

  /** Top-10 JSD movers between the `tr`-split halves of `docs`.
    * Per-token contribution ½ p_a ln(p_a/m) + ½ p_b ln(p_b/m),
    * m = (p_a + p_b)/2, over add-one smoothed probabilities; reported
    * in micro-nats so the 3dp round keeps signal at any corpus size.
    * Identical counts on both sides ⇒ contribution exactly 0 ONLY when
    * the split totals are also equal (p_a == p_b requires na == nb —
    * the DriftSpec corpus is built symmetric, which is what that pin
    * covers). On an UNEQUAL split (the production 80/20 shape), an
    * unmoved raw count still contributes positively because equal
    * counts are different RATES — that is the correct JSD semantics,
    * not noise; do not filter "unchanged" tokens by raw-count equality
    * (review finding r15: the old comment claimed the zero held
    * unconditionally).
    */
  def tokenDrift(docs: DataFrame, tr: org.apache.spark.sql.Column): DataFrame = {
    val tk = docs.select(tr.as("tr"),
      explode(TextOps.tokens(lower(col("text")))).as("tok"))
    val pc = tk.groupBy(col("tok"))
      .agg(sum(when(col("tr"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("tr"), 1L).otherwise(0L)).as("cb"))
    val scalars = pc.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("v"))
    val pa = (col("ca") + 1).cast("double") / (col("na") + col("v")).cast("double")
    val pb = (col("cb") + 1).cast("double") / (col("nb") + col("v")).cast("double")
    val m = (pa + pb) / 2.0
    val contrib = (pa * log(pa / m) + pb * log(pb / m)) / 2.0
    pc.crossJoin(broadcast(scalars))
      .select(col("tok"), col("ca"), col("cb"),
        round(pa, 6).as("p_train"), round(pb, 6).as("p_heldout"),
        round(contrib * 1e6, 3).as("jsd_contrib_micro"),
        contrib.as("__c"))
      .orderBy(col("__c").desc, col("tok"))
      .limit(10)
      .drop("__c")
  }

  def queries: Map[String, Q] = Map(
    "domain_kl" -> ((s, d) => domainKl(Tables.documents(s, d))),
    // the train (<80) / held-out (≥80) hash splits as the two snapshots
    "token_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      tokenDrift(docs, hashBucket(col("doc_id")) < 80)
    }))

  val oracles: Map[String, String] = Map(
    "domain_kl" ->
      (s"WITH tk AS (SELECT source, unnest(${TextSql.tokens("lower(text)")}) AS tok FROM documents), " +
        "sc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cs FROM tk GROUP BY 1, 2), " +
        "vc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY tok), " +
        "ns AS (SELECT source, CAST(sum(cs) AS BIGINT) AS n_s, CAST(count(*) AS BIGINT) AS vocab_seen FROM sc GROUP BY source), " +
        "sca AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM vc), " +
        "g AS (SELECT ns.source, ns.n_s, ns.vocab_seen, " +
        "CAST(coalesce(sc.cs, 0) + 1 AS DOUBLE) / (ns.n_s + sca.v) AS ps, " +
        "CAST(vc.c + 1 AS DOUBLE) / (sca.n + sca.v) AS pc " +
        "FROM vc CROSS JOIN ns LEFT JOIN sc ON sc.source = ns.source AND sc.tok = vc.tok CROSS JOIN sca) " +
        "SELECT source, n_s AS n_tokens, vocab_seen, " +
        "round(sum(ps * ln(ps / pc)), 6) AS kl_to_corpus " +
        "FROM g GROUP BY 1, 2, 3 ORDER BY source"),
    "token_drift" ->
      (s"WITH tk AS (SELECT $bucketSql < 80 AS tr, unnest(${TextSql.tokens("lower(text)")}) AS tok " +
        "FROM documents), " +
        "pc AS (SELECT tok, CAST(count(*) FILTER (tr) AS BIGINT) AS ca, " +
        "CAST(count(*) FILTER (NOT tr) AS BIGINT) AS cb FROM tk GROUP BY tok), " +
        "sca AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb, " +
        "CAST(count(*) AS BIGINT) AS v FROM pc), " +
        "g AS (SELECT tok, ca, cb, " +
        "CAST(ca + 1 AS DOUBLE) / (na + v) AS pa, CAST(cb + 1 AS DOUBLE) / (nb + v) AS pb " +
        "FROM pc CROSS JOIN sca), " +
        "j AS (SELECT tok, ca, cb, pa, pb, " +
        "(pa * ln(pa / ((pa + pb) / 2.0)) + pb * ln(pb / ((pa + pb) / 2.0))) / 2.0 AS contrib FROM g) " +
        "SELECT tok, ca, cb, round(pa, 6) AS p_train, round(pb, 6) AS p_heldout, " +
        "round(contrib * 1e6, 3) AS jsd_contrib_micro " +
        "FROM j ORDER BY contrib DESC, tok LIMIT 10"))
}
