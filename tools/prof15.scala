// Round-5 corpus-size scaling probe, clean instrument (prof14's rotation
// was flawed: trigram SETS are rotation-invariant, so copies shared all
// shingles and the probe measured duplicate multiplicity, not corpus
// growth -- still useful, it caught contamination_check's uncapped join).
// Here copy i prefixes every WORD with c<i>_, so each copy is an
// isomorphic relabeling: within-copy df profile identical to 1x,
// cross-copy shingle sets disjoint -- the corpus grows m-fold with a
// ~flat df distribution, which is what a real growing corpus looks like.
// Prints per-scale times and the least-squares log-log scaling exponent.
// Run: spark-shell --master local[32] --conf spark.sql.shuffle.partitions=32 \
//   --driver-memory 16g -cp target/scala-2.13/classes -I tools/prof15.scala
import org.apache.spark.sql.functions._
val src = "/root/testdata/sf0.1"
val docs0 = spark.read.parquet(src + "/documents.parquet")

def mkScale(m: Int): String = {
  val dst = s"/tmp/scalelab$m"
  val toks = split(col("text"), " ")
  (0 until m).map { i =>
    val relabeled = if (i == 0) col("text")
      else concat_ws(" ", transform(toks, w => concat(lit(s"c${i}_"), w)))
    docs0.withColumn("text", relabeled)
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
for (n <- names) {
  val ts = ms.map { m =>
    time(n, dirs(m)) // warm
    val t = math.min(time(n, dirs(m)), time(n, dirs(m)))
    println(f"SCALE $n%-22s m=$m%2d t=$t%8.2f s")
    t
  }
  // slope of ln t over ln m for m >= 3 (m=1 is fixed-overhead dominated)
  val pts = ms.zip(ts).filter(_._1 >= 3).map { case (m, t) => (math.log(m.toDouble), math.log(t)) }
  val nP = pts.size.toDouble; val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
  val sxx = pts.map(p => p._1 * p._1).sum; val sxy = pts.map(p => p._1 * p._2).sum
  val alpha = (nP * sxy - sx * sy) / (nP * sxx - sx * sx)
  println(f"EXPONENT $n%-22s alpha=$alpha%5.2f")
}
// Multiplicity stress on the now-CAPPED contamination_check, over
// prof14's 30x near-identical-copy corpus (df multiplied ~30x): the
// uncapped form measured 46.8 s here.
val stress = "/tmp/scalerot30"
if (new java.io.File(stress + "/documents.parquet").exists) {
  time("contamination_check", stress)
  val t = math.min(time("contamination_check", stress), time("contamination_check", stress))
  println(f"STRESS contamination_check 30x-dup t=$t%8.2f s (uncapped form: 46.8 s)")
}
System.exit(0)
