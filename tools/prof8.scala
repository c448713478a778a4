// Incremental-dedup volume measurement (PLANS.md "incremental vs full"):
// at a 10x-replicated corpus (50k docs), compare the join volumes of
//   (a) full-corpus minhash LSH self-join (what re-running batch dedup
//       over the whole corpus costs every ingest), vs
//   (b) incremental: incoming batch (1/5 of docs) joined against the
//       existing corpus's band index.
// Run: spark-shell --master 'local[16]' -cp target/scala-2.13/classes -I tools/prof8.scala
// NOTE: REPL evaluates line by line — every statement stays on one line.
import org.apache.spark.sql.functions._
val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val docs = (0 until 10).map(i => docs0.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))).reduce(_ union _).cache()
println(s"docs: ${docs.count()}")
val bands = docs.select(col("doc_id"), posexplode(graft.functions.TextOps.minhashBandsUdf(col("text"))).as(Seq("band", "sig"))).cache()
println(s"band rows: ${bands.count()}")
val l = bands.select(col("doc_id").as("a"), col("band"), col("sig"))
val r = bands.select(col("doc_id").as("b"), col("band"), col("sig"))
val full = l.join(r, Seq("band", "sig")).filter(col("a") < col("b")).count()
println(s"full self-join candidate rows: $full")
val incoming = bands.filter(col("doc_id") % 5 === 0)
val index = bands.filter(col("doc_id") % 5 =!= 0).select(col("band"), col("sig")).distinct()
val incr = incoming.join(index, Seq("band", "sig")).count()
println(s"incremental batch-vs-index candidate rows: $incr")
println(s"incoming band rows (map-stage volume): ${incoming.count()}")
System.exit(0)
