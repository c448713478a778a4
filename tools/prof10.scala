// dedup_clusters round-time probe (before/after edges pre-partitioning).
// Run: spark-shell --master local[32] --conf spark.sql.shuffle.partitions=32 -cp target/scala-2.13/classes -I tools/prof10.scala
val d = "/root/testdata/sf0.1"
val q = graft.SparkEntry.queries("dedup_clusters")
for (i <- 1 to 3) { val t0 = System.nanoTime(); q(spark, d).count(); println(f"dedup_clusters run $i: ${(System.nanoTime()-t0)/1e9}%.2f s") }
System.exit(0)
