// Round-3 plan audit: shard_packing2, dedup_incremental,
// pipeline_ledger_stages, t3_retry_sweep, health_check.
// Run: spark-shell --master 'local[8]' -cp target/scala-2.13/classes -I tools/plans3.scala
val d = "/root/testdata/sf0.01"
for (q <- Seq("shard_packing2", "dedup_incremental", "pipeline_ledger_stages", "t3_retry_sweep", "health_check", "corpus_mix", "ann_int8_topk", "zorder_layout")) {
  println(s"\n===== $q =====")
  graft.SparkEntry.queries(q)(spark, d).explain("formatted")
}
System.exit(0)
