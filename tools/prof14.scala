// Round-5 multiplicity scaling probe (VERDICT r4 #7): measure the
// corpus-size scaling EXPONENT of the df-capped pair generators
// (dedup_jaccard_capped, dedup_winnow_pairs) and of contamination_check
// (NOT df-capped -- the probe is what decides whether that matters).
//
// Replication method: copy i of the sf0.1 corpus rotates each doc's
// word sequence by i positions (deterministic, id-shifted). Unlike
// prof12's identical copies -- which multiply every shingle's df by m
// and so DEGENERATE the capped paths (everything over the cap drops
// out, the probe then measures the trivial filtered plan) -- rotation
// gives each copy mostly-disjoint shingles, so the global df profile
// stays ~flat while the corpus grows mx: the probe measures genuine
// corpus-size scaling.
//
// Run: spark-shell --master local[32] --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 16g -cp target/scala-2.13/classes -I tools/prof14.scala
import org.apache.spark.sql.functions._
val src = "/root/testdata/sf0.1"
val docs0 = spark.read.parquet(src + "/documents.parquet")

def mkScale(m: Int): String = {
  val dst = s"/tmp/scalerot$m"
  val toks = split(col("text"), " ")
  (0 until m).map { i =>
    val rotated =
      if (i == 0) col("text")
      else concat_ws(" ",
        concat(slice(toks, i + 1, 100000), slice(toks, 1, i)))
    docs0
      .withColumn("text", rotated)
      .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
  }.reduce(_ union _).repartition(32)
    .write.mode("overwrite").parquet(dst + "/documents.parquet")
  dst
}

val names = Seq("dedup_jaccard_capped", "dedup_winnow_pairs", "contamination_check")
def time(n: String, d: String): Double = {
  val t0 = System.nanoTime(); graft.SparkEntry.queries(n)(spark, d).count()
  (System.nanoTime() - t0) / 1e9
}
val ms = Seq(1, 3, 10, 30)
val dirs = ms.map(m => m -> mkScale(m)).toMap
for (m <- ms) println(s"scale $m docs: " + spark.read.parquet(dirs(m) + "/documents.parquet").count())
for (n <- names; m <- ms) {
  time(n, dirs(m)) // warm
  val t = math.min(time(n, dirs(m)), time(n, dirs(m)))
  println(f"SCALE $n%-22s m=$m%2d t=$t%8.2f s")
}
System.exit(0)
