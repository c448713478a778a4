// Round-10 probe: dedup_incremental batch cost vs stored-index size.
// The 100 TB ingestion question: with fp/band index PRECOMPUTED (as in
// production -- DedupIndex.accept appends them per batch), how does the
// per-batch dedupAgainst cost grow as the index grows 1x -> 30x?
// Run: /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//   --driver-class-path target/scala-2.13/classes -i tools/prof24.scala
import org.apache.spark.sql.functions._
val s2 = spark
s2.conf.set("spark.sql.session.timeZone", "UTC")
s2.conf.set("spark.sql.shuffle.partitions", "32")
val docs = graft.Tables.documents(s2, "/root/testdata/sf0.1")
val incoming = docs.filter(col("doc_id") % 10 === 0).localCheckpoint()
def timed(tag: String)(f: => Long): Unit = {
  val t0 = System.nanoTime; val n = f
  System.err.println(f"### $tag: ${(System.nanoTime - t0)/1e9}%.2f s ($n rows)")
}
for (n <- Seq(1, 5, 15, 30)) {
  val existing = (0 until n).map(i =>
    docs.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
      concat(col("text"), lit(s" uniq$i")).as("text"))).reduce(_ union _)
  val fp = graft.operators.DedupIndex.fingerprints(existing).localCheckpoint()
  val bands = graft.operators.DedupIndex.bandRows(existing).localCheckpoint()
  // warm once (JIT/codegen), then measure twice
  graft.operators.DedupIndex.dedupAgainst(incoming, fp, bands).count()
  timed(s"${n}x warm1") { graft.operators.DedupIndex.dedupAgainst(incoming, fp, bands).count() }
  timed(s"${n}x warm2") { graft.operators.DedupIndex.dedupAgainst(incoming, fp, bands).count() }
}
System.exit(0)
