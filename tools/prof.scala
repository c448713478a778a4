// Profiling scratchpad: spark-shell -i tools/prof.scala
import org.apache.spark.sql.functions._
val d = "/root/testdata/sf0.1"
def time[T](name: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(s"TIMED $name: ${(System.nanoTime() - t0) / 1e9}%s sec".format(""))
  r
}
val docs2 = graft.Tables.documents(spark, d)
val q = graft.operators.DedupQueries.queries("dedup_ngram_jaccard")
time("warmup") { docs2.count() }
time("jaccard_1st") { q(spark, d).count() }
time("jaccard_2nd") { q(spark, d).count() }
val q2 = graft.operators.DedupQueries.queries("dedup_minhash_lsh")
time("minhash_1st") { q2(spark, d).count() }
val q3 = graft.operators.DedupQueries.queries("dedup_simhash")
time("simhash_1st") { q3(spark, d).count() }
// where does the time go? shingle relation alone:
val docs = graft.Tables.documents(spark, d)
val sh = docs.select(col("doc_id"), graft.functions.TextOps.shingles3Udf(col("text")).as("shs"))
  .select(col("doc_id"), size(col("shs")).cast("long").as("n_sh"), explode(col("shs")).as("sh"))
time("shingle_rel") { sh.count() }
time("shingle_rel_2nd") { sh.count() }
System.exit(0)
