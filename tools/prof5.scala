import org.apache.spark.sql.functions._
val d = "/root/testdata/sf0.1"
def time[T](name: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(s"TIMED $name: " + ((System.nanoTime() - t0) / 1e9) + " sec")
  r
}
graft.Tables.documents(spark, d).count() // warm
time("minhash") { graft.operators.DedupQueries.queries("dedup_minhash_lsh")(spark, d).count() }
time("jaccard") { graft.operators.DedupQueries.queries("dedup_ngram_jaccard")(spark, d).count() }
time("search_e2e") { graft.operators.VectorQueries.queries("search_e2e")(spark, d).count() }
// pushdown + pruning checks
println("=== f2 plan ===")
graft.operators.RelationalQueries.queries("f2_size_filter")(spark, d).explain("formatted")
println("=== chunk_fixed plan ===")
graft.operators.TextQueries.queries("chunk_fixed")(spark, d).explain("formatted")
// entry smoke
val e = graft.SparkEntry.entry(spark)
println("ENTRY rows: " + e.count())
System.exit(0)
