package graft.operators

import graft.Tables
import graft.operators.TableAssertions.assertSameTable
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r14 session artifact caches (trained quantizer, raw-space PQ
  * codebooks+codes, lang bucket counts) serve several queries from one
  * materialization. The DuckDB gate already proves each cached QUERY
  * right in isolation; what it cannot see is a cache KEY bug (one
  * corpus served another's artifacts) or an owner/consumer drift (the
  * cold build deriving something subtly different from the consumer's
  * inline form). Pin both: after the cold owner runs and seeds, every
  * consumer's cache-hit result is row-identical to the from-scratch
  * derivation of the same relation.
  */
class ArtifactCacheParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("PQ consumers after ann_codebook_build seeds == fresh AnnPq derivation") {
    graft.SparkEntry.queries("ann_codebook_build")(spark, d).collect() // cold build + seed
    val e = Tables.embeddings(spark, d)
    val qs = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    assertSameTable(
      graft.SparkEntry.queries("ann_pq_topk")(spark, d),
      AnnPq.search(e, qs, k = 3).orderBy("q_id", "rnk"),
      "cached ann_pq_topk vs fresh AnnPq.search")
  }

  test("semdedup through the seeded quantizer cache == fresh k-means loop") {
    graft.SparkEntry.queries("ann_recall_trained")(spark, d).collect() // trains cold + seeds
    assertSameTable(
      graft.SparkEntry.queries("semdedup")(spark, d),
      AnnQueries.semDedup(Tables.embeddings(spark, d)),
      "cached semdedup vs fresh semDedup")
  }

  test("lang classifier through the bucket-count cache == fresh derivation") {
    val docs = Tables.documents(spark, d)
    val fresh = CurationQueries.langScoreDocs(docs,
        CurationQueries.langCountsOf(docs), CurationQueries.langPriorsOf(docs))
    val viaCache = graft.SparkEntry.queries("lang_classifier")(spark, d)
      .select(col("doc_id"), col("pred_lang"), col("score"))
    assertSameTable(viaCache.orderBy("doc_id"),
      fresh.select(col("doc_id"), col("pred_lang"), col("score")).orderBy("doc_id"),
      "cached lang_classifier vs fresh langScoreDocs")
  }

  test("cache keys are corpus-scoped: two dirs in one session never cross-serve") {
    // seed from sf0.001, then derive on sf0.01 — a key bug (appId-only
    // key) would serve the 50-doc artifacts to the 500-doc corpus and
    // the counts below would disagree
    val d2 = "/root/testdata/sf0.01"
    graft.SparkEntry.queries("ann_codebook_build")(spark, d).collect()
    val n2 = graft.SparkEntry.queries("ann_codebook_build")(spark, d2)
      .agg(sum(col("n_codes"))).collect()(0).getLong(0)
    val expected2 = Tables.embeddings(spark, d2).count() * AnnPq.M
    assert(n2 == expected2, s"sf0.01 build saw $n2 codes, corpus has $expected2")
    val t1 = graft.SparkEntry.queries("ann_pq_topk")(spark, d).collect()
    val t2 = graft.SparkEntry.queries("ann_pq_topk")(spark, d2).collect()
    assert(t1.toSeq != t2.toSeq, "two corpora returned identical top-k — cross-served cache")
  }
}
