package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Results must not depend on `spark.sql.shuffle.partitions` — that is
  * exactly the knob that changes when a plan moves from local[32] to a
  * 1000-executor cluster, and the classic way it leaks into results is
  * cross-partition float aggregation order. This engine's float math is
  * confined to per-row folds precisely so repartitioning cannot reorder
  * it; this spec proves that by running float-scoring and multi-shuffle
  * queries under a different partition count (isolated via
  * `newSession()`, which shares the context but owns its SQLConf) and
  * requiring identical results.
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private val queries = Seq(
    "v1_cosine_topk",     // float cosine scores + top-k
    "ann_int8_topk",      // int8 ranking with float rescale
    "hybrid_bm25_rrf",    // BM25 doubles from integer stats
    "dedup_jaccard_capped", // multi-shuffle join pipeline
    "corpus_stats",       // avg + pct doubles
    "embedding_pca",      // cross-row double sums, float-cast absorbed
    "domain_kl",          // cross-row double KL sum, 6dp-round absorbed
    "token_drift",        // top-k cut on an UNROUNDED double ln chain
    "token_entropy",      // Σ c·ln c order jitter under the 6dp round
    "length_quantiles",   // rank windows over two shuffled relations
    "dedup_recall_planted") // minhash UDF + multi-key equi-join

  test("results identical under a different shuffle-partition count") {
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "7")
    queries.foreach { name =>
      val base = graft.SparkEntry.queries(name)(spark, d).collect().map(_.toSeq).toSeq
      val other = graft.SparkEntry.queries(name)(alt, d).collect().map(_.toSeq).toSeq
      assert(base == other, s"$name differs between 2 and 7 shuffle partitions")
      assert(base.nonEmpty, s"$name returned no rows")
    }
  }
}
