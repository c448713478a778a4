import org.apache.spark.sql.functions._
val d = "/root/testdata/sf0.1"
def time[T](name: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(s"TIMED $name: " + ((System.nanoTime() - t0) / 1e9) + " sec")
  r
}
val q = graft.operators.DedupQueries.queries("dedup_ngram_jaccard")
val df = q(spark, d)
time("warm") { graft.Tables.documents(spark, d).count() }
time("jaccard") { df.count() }
df.explain("formatted")
System.exit(0)
