package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join — the string-metric sibling of the
  * set-similarity dedup family (`dedup_ngram_jaccard` et al.). Finds
  * all key pairs within Levenshtein distance K without an all-pairs
  * comparison, via PARTITION-based filtering (Pass-Join — Li, Deng &
  * Feng, ICDE 2011):
  *
  *  - each string x is split into K+1 disjoint segments (even split by
  *    its length's scheme). In any alignment with <= K edits, the K+1
  *    segments cannot all contain an edit (pigeonhole), so at least
  *    one segment of x occurs in y EXACTLY, shifted by at most K
  *    positions (the shift is the net indel count before it);
  *  - so the candidate join is segments(x) equi-joined against the
  *    probe substrings of y: for every plausible source length
  *    lx in [len(y)-K, len(y)+K], every segment slot j, every start
  *    within the +-K shift window — a constant ~(2K+1)^2*(K+1) probe
  *    rows per string;
  *  - candidates are verified with the banded O(K*n)
  *    `levenshtein(a, b, K)` (threshold form — abandons a row as soon
  *    as the band exceeds K).
  *
  * The filter is EXACT-RECALL with no precondition beyond len >= K+1
  * (segments must be non-empty): the DuckDB oracle is the BRUTE FORCE
  * over all pairs, so the correctness row proves the partition
  * filter's completeness rather than merely mirroring it.
  *
  * Why not q-gram prefix filtering (Gravano et al. 2001 / Ed-Join,
  * VLDB 2008)? Measured on this corpus at sf0.1 (10k keys): the
  * word-salad vocabulary saturates small gram spaces, so even the
  * rarest prefix grams are hot — q=2 OOMs the candidate join, q=4
  * still yields 2.4M candidates and q=5 1.4M, versus the handful of
  * true pairs. Pass-Join's ~10-char segments stay near-unique, so the
  * candidate set tracks the true-pair count. Low-entropy text is the
  * norm, not the exception, in a dedup-grade corpus — the partition
  * filter is the 100 TB-safe choice.
  *
  * 100 TB posture: every exchange is keyed (the segment equi-join on
  * (seg, lx, j), the pair distinct, the id-equi verify joins) — no
  * all-pairs stage exists. Fan-out per string is a CONSTANT (~45 probe
  * rows at K=2), so the join input is linear in corpus size; a hot
  * segment (a phrase shared verbatim across many docs in the same
  * slot) creates candidates proportional to the true near-dup mass it
  * signals — quadratic blow-up requires quadratically many true
  * near-identical prefixes, which is the output's own size, not an
  * artifact of the filter.
  *
  * Corpus derivation (the `dedup_recall_planted` discipline): keys are
  * 30-char document prefixes; each doc also yields a mutant copy under
  * negated id (deterministic delete, plus a substitution for id%3==0,
  * plus a 2-char insertion for id%7==0 — the last pushes those mutants
  * PAST K=2, planting true negatives). All mutation arithmetic is
  * substring/concat on integer positions, replayed verbatim in DuckDB.
  */
object EditDistanceQueries {
  type Q = (SparkSession, String) => DataFrame

  private val K = 2 // max edit distance; K+1 = 3 segments

  /** Base keys (positive ids) + planted mutants (negated ids). Column
    * contract: (id: long, key: string), key length >= 6.
    */
  private def plantedKeys(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id").cast("long").as("id"),
      expr("substring(text, 1, 30)").as("key"))
    val mut = base
      .withColumn("s1",
        expr("concat(substring(key, 1, (id % 17 + 5) - 1), substring(key, (id % 17 + 5) + 1))"))
      .withColumn("s2",
        expr("IF(id % 3 = 0, concat(substring(s1, 1, (id % 11 + 3) - 1), 'z', " +
          "substring(s1, (id % 11 + 3) + 1)), s1)"))
      .withColumn("s3",
        expr("IF(id % 7 = 0, concat(substring(s2, 1, 23), 'qq', substring(s2, 24)), s2)"))
      // -(id+1), not -id: doc_id starts at 0 and -0 == 0 would alias
      // the base row's id (the synthetic-id discipline)
      .select((-(col("id") + 1)).as("id"), col("s3").as("key"))
    base.unionByName(mut).filter(length(col("key")) >= 6)
  }

  // Even partition of length lx into K+1 segments: b = lx div (K+1),
  // r = lx mod (K+1); the last r segments are one longer. 1-based slot
  // j. K is INTERPOLATED, never hardcoded (review finding r15: literal
  // 3s here meant bumping K compiled but silently corrupted the
  // partition scheme the exact-recall proof rests on).
  private val Kp1 = K + 1
  private def segLenSql(lx: String, j: String) =
    s"(($lx DIV $Kp1) + IF($j > $Kp1 - $lx % $Kp1, 1, 0))"
  private def segStartSql(lx: String, j: String) =
    s"(1 + ($j - 1) * ($lx DIV $Kp1) + GREATEST(0, $j - 1 - ($Kp1 - $lx % $Kp1)))"

  /** The join itself, exposed for specs: all pairs (id_a < id_b) from
    * `keys` (id, key) with levenshtein <= K, via Pass-Join partition
    * filtering + banded verify. Exact-recall for keys of length > K
    * (shorter keys cannot form K+1 non-empty segments and are
    * excluded from BOTH sides — with len >= 6 enforced upstream the
    * precondition is vacuous here).
    */
  def editDistanceJoin(keysIn: DataFrame): DataFrame = {
    // materialize the narrow key relation ONCE (review finding r15):
    // it feeds four subtrees (segs, probes, both verify joins), and the
    // plantedKeys derivation behind it reads the corpus twice — without
    // the pin Catalyst re-plans that subtree per reference, ~8 corpus
    // scans per query (the BoundedRank / heavy_hitters_cms discipline;
    // production substitute is persist(DISK_ONLY), as documented there)
    val keys = keysIn.filter(length(col("key")) > K)
      .select(col("id"), col("key"), length(col("key")).as("len"))
      .localCheckpoint()
    // segment side: the K+1 segments of each string under ITS OWN
    // length's scheme
    val segs = keys
      .select(col("id"), col("key"), col("len").as("lx"),
        explode(sequence(lit(1), lit(K + 1))).as("j"))
      .select(col("id").as("id_a"),
        expr(s"substring(key, ${segStartSql("lx", "j")}, ${segLenSql("lx", "j")})").as("seg"),
        col("lx"), col("j"))
    // probe side: for every plausible source length and slot, the
    // substrings within the +-K shift window (clipped to the string;
    // an empty window yields no probe rows)
    val probes = keys
      .select(col("id"), col("key"), col("len"),
        explode(sequence(col("len") - K, col("len") + K)).as("lx"))
      .select(col("id"), col("key"), col("len"), col("lx"),
        explode(sequence(lit(1), lit(K + 1))).as("j"))
      .withColumn("slen", expr(segLenSql("lx", "j")))
      .withColumn("lo", greatest(lit(1), expr(segStartSql("lx", "j")) - K))
      .withColumn("hi", least(col("len") - col("slen") + 1,
        expr(segStartSql("lx", "j")) + lit(K)))
      .select(col("id"), col("key"), col("lx"), col("j"), col("slen"),
        explode(expr("IF(hi >= lo, sequence(lo, hi), array())")).as("p"))
      .select(col("id").as("id_b"), expr("substring(key, p, slen)").as("seg"),
        col("lx"), col("j"))
      .distinct()
    val cand = segs.join(probes, Seq("seg", "lx", "j"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
    cand
      .join(keys.select(col("id").as("id_a"), col("key").as("ka")), "id_a")
      .join(keys.select(col("id").as("id_b"), col("key").as("kb")), "id_b")
      .filter(abs(length(col("ka")) - length(col("kb"))) <= K)
      // banded threshold form: O(K*n) per pair and early abandon
      .withColumn("dist", levenshtein(col("ka"), col("kb"), K))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }

  val queries: Map[String, Q] = Map(
    "editdist_join" -> ((s, d) =>
      editDistanceJoin(plantedKeys(Tables.documents(s, d)))
        .orderBy("id_a", "id_b"))
  )

  /** Brute-force oracle: guards and mutations mirrored, then ALL pairs
    * verified with full levenshtein — equality with the Spark result
    * proves the partition filter lost nothing.
    */
  val oracles: Map[String, String] = Map(
    "editdist_join" ->
      ("""WITH base AS (
         |  SELECT doc_id AS id, substr(text, 1, 30) AS key FROM documents
         |), mut AS (
         |  SELECT -(id + 1) AS id,
         |    CASE WHEN id % 7 = 0 THEN concat(substr(s2,1,23),'qq',substr(s2,24)) ELSE s2 END AS key
         |  FROM (
         |    SELECT id,
         |      CASE WHEN id % 3 = 0 THEN concat(substr(s1,1,(id % 11 + 3)-1),'z',substr(s1,(id % 11 + 3)+1)) ELSE s1 END AS s2
         |    FROM (
         |      SELECT id, concat(substr(key,1,(id % 17 + 5)-1), substr(key,(id % 17 + 5)+1)) AS s1
         |      FROM base) d1) d2
         |), keys AS (
         |  SELECT id, key FROM base WHERE length(key) >= 6
         |  UNION ALL SELECT id, key FROM mut WHERE length(key) >= 6
         |)
         |SELECT a.id AS id_a, b.id AS id_b, CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
         |FROM keys a JOIN keys b ON a.id < b.id
         | AND abs(length(a.key) - length(b.key)) <= 2 AND levenshtein(a.key, b.key) <= 2
         |ORDER BY id_a, id_b""".stripMargin)
  )
}
