import org.apache.spark.sql.functions._
val d = "/root/testdata/sf0.1"
def time[T](name: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(s"TIMED $name: " + ((System.nanoTime() - t0) / 1e9) + " sec")
  r
}
val docs = graft.Tables.documents(spark, d)
val toks = docs.select(col("doc_id"), graft.functions.TextOps.tokens(col("text")).as("toks"))
time("tokens_only") { toks.select(explode(col("toks"))).count() }
val sh0 = toks.select(col("doc_id"), graft.functions.TextOps.shinglesFromTokens(col("toks")).as("shs"))
time("shingles_nodistinct") {
  toks.select(col("doc_id"), transform(sequence(lit(0), size(col("toks")) - 3),
    i => concat_ws(" ", element_at(col("toks"), i + 1), element_at(col("toks"), i + 2), element_at(col("toks"), i + 3))).as("shs"))
    .select(explode(col("shs"))).count()
}
time("shingles_full") { sh0.select(explode(col("shs"))).count() }
sh0.select(col("doc_id"), explode(col("shs")).as("sh")).explain("formatted")
time("seq_only") { toks.select(explode(sequence(lit(0), size(col("toks")) - 3))).count() }
System.exit(0)
