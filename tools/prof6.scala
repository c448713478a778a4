import org.apache.spark.sql.functions._
val d = "/root/testdata/sf0.1"
def time(name: String)(f: => Long): Unit = {
  val t0 = System.nanoTime(); val n = f
  println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
}
val docs = graft.Tables.documents(spark, d)
// stage 1: shingle relation alone (UDF + explode)
val sh = docs.repartition(8)
  .select(col("doc_id"), graft.functions.TextOps.shingles3Udf(col("text")).as("shs"))
  .select(col("doc_id"), size(col("shs")).cast("long").as("n_sh"), explode(col("shs")).as("sh"))
time("shingleRel count")(sh.count())
time("shingleRel count again")(sh.count())
// stage 2: df stats
val rare = sh.groupBy(col("sh")).agg(count(lit(1)).as("df")).filter(col("df") <= 10).select(col("sh"))
time("rare shingles")(rare.count())
// stage 3: candidate join
val shR = sh.join(rare, Seq("sh"))
val cand = shR.select(col("doc_id").as("doc_a"), col("sh"))
  .join(shR.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh"))
  .filter(col("doc_a") < col("doc_b")).select(col("doc_a"), col("doc_b"))
time("candidates")(cand.count())
time("full capped query")(graft.SparkEntry.queries("dedup_jaccard_capped")(spark, d).count())
System.exit(0)
