// 10x scale-trend probe (round 4): replicate sf0.1 documents/embeddings
// verbatim with shifted ids (prof8's method) into /tmp/scale10, then time
// the scale-critical queries at 1x and 10x. Identical-copy replication is
// deliberately duplication-heavy: it stresses exactly the df-capped /
// banded / bucketed shapes whose claim is "candidate volume stays linear
// even when the data is pathologically self-similar".
// Run: spark-shell --master local[32] --conf spark.sql.shuffle.partitions=32 --driver-memory 16g -cp target/scala-2.13/classes -I tools/prof12.scala
import org.apache.spark.sql.functions._
val src = "/root/testdata/sf0.1"
val dst = "/tmp/scale10"
val docs0 = spark.read.parquet(src + "/documents.parquet")
(0 until 10).map(i => docs0.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))).reduce(_ union _).repartition(32).write.mode("overwrite").parquet(dst + "/documents.parquet")
val emb0 = spark.read.parquet(src + "/embeddings.parquet")
(0 until 10).map(i => emb0.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))).reduce(_ union _).repartition(32).write.mode("overwrite").parquet(dst + "/embeddings.parquet")
println(s"10x docs: ${spark.read.parquet(dst + "/documents.parquet").count()}, embeddings: ${spark.read.parquet(dst + "/embeddings.parquet").count()}")
val names = Seq("dedup_exact", "fingerprint", "dedup_minhash_lsh", "dedup_simhash_pairs", "dedup_ngram_jaccard", "dedup_jaccard_capped", "dedup_winnow_pairs", "dedup_clusters", "dedup_incremental", "embed_neardup_lsh", "ann_lsh_topk", "ann_ivf_topk", "ann_int8_topk", "sim_knn_join", "hybrid_bm25_rrf", "tfidf_topk", "dup_ngram_ratio", "gopher_quality", "vocab_topk", "token_count", "corpus_mix", "curation_e2e", "zorder_layout", "shard_packing2", "chunk_fixed", "pipeline_embed")
def time(n: String, d: String): Double = { val t0 = System.nanoTime(); graft.SparkEntry.queries(n)(spark, d).count(); (System.nanoTime() - t0) / 1e9 }
for (n <- names) { time(n, src); val t1 = time(n, src); val t10 = time(n, dst); val t10b = time(n, dst); println(f"SCALE $n%-22s 1x=${t1}%7.2f s  10x=${math.min(t10, t10b)}%7.2f s  ratio=${math.min(t10, t10b) / t1}%5.1f") }
System.exit(0)
