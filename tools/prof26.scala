// Round-10 probe: bloom-prefiltered increment vs the plain join
// pipeline as the stored index grows 1x -> 30x. The bloom's claim is a
// PLAN claim (index scanned, never exchanged) -- this measures what that
// buys per batch once the blooms are prebuilt (as production holds
// them: built at accept/compact time, persisted next to the index).
// Run: /opt/spark/bin/spark-shell --master local[32] --driver-memory 24g \
//   --driver-class-path target/scala-2.13/classes -i tools/prof26.scala
import org.apache.spark.sql.functions._
val s2 = spark
s2.conf.set("spark.sql.session.timeZone", "UTC")
s2.conf.set("spark.sql.shuffle.partitions", "32")
val docs = graft.Tables.documents(s2, "/root/testdata/sf0.1")
// two regimes: a batch of near-dups of indexed content (every row hits
// the blooms -- the prefilter routes nothing, worst case) and a batch of
// genuinely new content (bloom-miss bulk -- the common arrival regime)
val incomingDup = docs.filter(col("doc_id") % 10 === 0).localCheckpoint()
val incomingNew = docs.filter(col("doc_id") % 10 === 0)
  .select(col("doc_id"), concat_ws(" ", md5(col("text").cast("binary")),
    md5(concat(col("text"), lit("x")).cast("binary"))).as("text")).localCheckpoint()
def timed(tag: String)(f: => Long): Unit = {
  val t0 = System.nanoTime; val n = f
  System.err.println(f"### $tag: ${(System.nanoTime - t0)/1e9}%.2f s ($n rows)")
}
for (n <- Seq(1, 10, 30)) {
  val existing = (0 until n).map(i =>
    docs.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
      concat(col("text"), lit(s" uniq$i")).as("text"))).reduce(_ union _)
  val fp = graft.operators.DedupIndex.fingerprints(existing).localCheckpoint()
  val bands = graft.operators.DedupIndex.bandRows(existing).localCheckpoint()
  // blooms prebuilt (the production holding pattern); sized to the data
  val blooms = graft.operators.DedupIndex.buildBlooms(fp, bands,
    expectedItems = math.max(1L << 20, n * 400000L))
  // warm once each, then measure twice each
  for ((incoming, tag) <- Seq((incomingDup, "dupbatch"), (incomingNew, "newbatch"))) {
    graft.operators.DedupIndex.dedupAgainst(incoming, fp, bands).count()
    graft.operators.DedupIndex.dedupAgainstBloom(incoming, fp, bands, blooms._1, blooms._2).count()
    timed(s"${n}x $tag plain warm1") { graft.operators.DedupIndex.dedupAgainst(incoming, fp, bands).count() }
    timed(s"${n}x $tag plain warm2") { graft.operators.DedupIndex.dedupAgainst(incoming, fp, bands).count() }
    timed(s"${n}x $tag bloom warm1") { graft.operators.DedupIndex.dedupAgainstBloom(incoming, fp, bands, blooms._1, blooms._2).count() }
    timed(s"${n}x $tag bloom warm2") { graft.operators.DedupIndex.dedupAgainstBloom(incoming, fp, bands, blooms._1, blooms._2).count() }
  }
}
System.exit(0)