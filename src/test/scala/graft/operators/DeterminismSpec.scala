package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The oracle gate hash-compares results, so any nondeterminism —
  * shuffle-order-dependent ties in top-k/rank queries are the classic
  * source — is a correctness failure. Every ranked query must carry an
  * explicit total tiebreak; this spec re-executes the tie-prone queries
  * and requires bit-identical results.
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private val tieProne = Seq(
    "v1_cosine_topk", "v2_filtered_topk", "v3_rerank", "search_e2e",
    "sim_knn_join", "ann_lsh_topk", "window_topn", "v6_sort_limit",
    "hybrid_bm25_rrf", "sessionize", "asof_join", "dedup_clusters",
    "dedup_incremental", "shard_packing2", "ann_int8_topk",
    "corpus_temperature", "source_cap", "lm_score", "dedup_canonicalize",
    "dsir_select", "semdedup", "substring_dedup",
    "semdedup_incremental", "minhash_jaccard_audit", "sequence_pack",
    "ann_pq_topk", "ann_pq_recall", "dedup_bloom_prefilter",
    "ann_ivf_pq", "hard_negatives", "embedding_pca", "corpus_shuffle",
    "gopher_repetition", "ccnet_buckets", "lm_score_bigram",
    "quality_ensemble", "epoch_mix", "source_overlap_minhash",
    "bpe_fertility", "ngram_novelty", "boilerplate_rate", "token_budget",
    "lang_confusion", "dedup_cluster_stats", "embedding_norm_audit",
    "mm_phash", "mm_phash_pairs", "quality_calibration", "pack_efficiency",
    "token_drift", "heavy_hitters_cms", "distinct_kmv",
    "length_quantiles", "ann_ivf_pq_residual", "ann_recall_curve",
    "dedup_recall_curve", "ann_lsh_plane_curve", "ann_recall_clustered",
    "ann_lsh_plane_curve_clustered", "g2_structured_chunks",
    "funnel_steps_4", "bitext_margin", "weighted_sample")

  test("tie-prone ranked queries are run-to-run deterministic") {
    val qs = graft.SparkEntry.queries
    tieProne.foreach { name =>
      val r1 = qs(name)(spark, d).collect().map(_.toSeq).toSeq
      val r2 = qs(name)(spark, d).collect().map(_.toSeq).toSeq
      assert(r1 == r2, s"$name differs between two executions")
      assert(r1.nonEmpty, s"$name returned no rows at sf0.001")
    }
  }
}
