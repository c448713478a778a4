import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
// 10x-corpus dedup probe: replicate sf0.1 documents with shifted ids
// (50k docs) and compare candidate-pair volume + runtime of the capped
// vs uncapped shingle join. Evidence for PLANS.md.
val d = "/root/testdata/sf0.1"
val base = graft.Tables.documents(spark, d)
val docs = ((0 until 10).map(k => base.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"), col("text"))).reduce(_ union _).repartition(64).cache())
println("[prof7] docs=" + docs.count())
val sh = (docs.select(col("doc_id"), explode(graft.functions.TextOps.shingles3Udf(col("text"))).as("sh")).cache())
println("[prof7] shingle rows=" + sh.count())
def pairs(rel: DataFrame): DataFrame = (rel.select(col("doc_id").as("a"), col("sh")).join(rel.select(col("doc_id").as("b"), col("sh")), Seq("sh")).filter(col("a") < col("b")))
def time(name: String)(f: => Long): Unit = { val t0 = System.nanoTime(); val n = f; println(f"[prof7] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s  rows=$n") }
val rare = (sh.groupBy(col("sh")).agg(count(lit(1)).as("df")).filter(col("df") <= 10).select(col("sh")))
val shRare = sh.join(rare, Seq("sh"))
time("capped candidate pairs")(pairs(shRare).count())
time("UNCAPPED candidate pairs")(pairs(sh).count())
System.exit(0)
