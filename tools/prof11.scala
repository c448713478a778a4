// Plan audit for tfidf_topk / dup_ngram_ratio (round 4).
// Run: spark-shell --master local[32] --conf spark.sql.shuffle.partitions=32 -cp target/scala-2.13/classes -I tools/prof11.scala
val d = "/root/testdata/sf0.1"
println("=== tfidf_topk ===")
graft.SparkEntry.queries("tfidf_topk")(spark, d).explain("formatted")
println("=== dup_ngram_ratio ===")
graft.SparkEntry.queries("dup_ngram_ratio")(spark, d).explain("formatted")
for (n <- Seq("tfidf_topk", "dup_ngram_ratio"); i <- 1 to 2) { val t0 = System.nanoTime(); graft.SparkEntry.queries(n)(spark, d).count(); println(f"$n run $i: ${(System.nanoTime()-t0)/1e9}%.2f s") }
System.exit(0)
