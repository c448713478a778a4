// Round-7 probe: the 1M-vector point for the stored LSH search path
// (extends prof21's duplication ladder to 500x — past the scheduler
// floor, so flat-vs-linear is no longer masked by overhead). Also
// refines 8->14 planes at 1M rows and re-searches: the documented
// response to duplication-driven bucket growth.
//
// Run: /opt/spark/bin/spark-shell --master local[32] \
//   --conf spark.sql.shuffle.partitions=32 --driver-memory 24g \
//   -cp target/scala-2.13/classes -I tools/prof22.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.AnnLshIndex

val d = "/root/testdata/sf0.1"
val dir = "/tmp/prof22/lsh_n500"

def timeIt(label: String, reps: Int = 3)(f: => Long): Double = {
  var best = Double.MaxValue
  var n = 0L
  for (_ <- 1 to reps) {
    val t0 = System.nanoTime()
    n = f
    best = math.min(best, (System.nanoTime() - t0) / 1e9)
  }
  println(f"[prof22] $label%-40s $best%8.2fs (rows=$n)")
  best
}

val e500 = {
  graft.Tables.embeddings(spark, d).
    crossJoin(spark.range(500).select(col("id").as("copy"))).
    select((col("vec_id") + col("copy") * 10000000L).as("vec_id"), col("embedding"))
}

val queries20 = {
  graft.Tables.embeddings(spark, d).
    filter(col("vec_id") < 20).
    select(col("vec_id").as("q_id"), col("embedding").as("qv")).
    localCheckpoint()
}

timeIt("init n=500 (1,000,000 vecs)", reps = 1) {
  AnnLshIndex.init(e500, dir); spark.read.parquet(s"$dir/vectors").count()
}
timeIt("search n=500 k=3 p=2") {
  AnnLshIndex.search(spark, dir, queries20, k = 3, nProbes = 2,
    maxBucket = 1000000).count()
}
timeIt("searchInt8 n=500 k=3 p=2") {
  AnnLshIndex.searchInt8(spark, dir, queries20, k = 3, nProbes = 2,
    maxBucket = 1000000).count()
}
timeIt("refine n=500 8->14 planes", reps = 1) {
  AnnLshIndex.refine(spark, dir, 14); AnnLshIndex.numPlanes(spark, dir).toLong
}
timeIt("search n=500 after refine (16k buckets)") {
  AnnLshIndex.search(spark, dir, queries20, k = 3, nProbes = 2,
    maxBucket = 1000000).count()
}
System.exit(0)
