import org.apache.spark.sql.functions._
val d = "/root/testdata/sf0.1"
def time[T](name: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(s"TIMED $name: " + ((System.nanoTime() - t0) / 1e9) + " sec")
  r
}
val docs = graft.Tables.documents(spark, d)
// warmup scan
time("warmup") { docs.select(length(col("text"))).agg(sum("length(text)")).count() }

val shingleUdf = udf { (text: String) =>
  val toks = text.trim.split("\\s+")
  if (toks.length >= 3) {
    val out = new scala.collection.mutable.LinkedHashSet[String]
    var i = 0
    while (i <= toks.length - 3) { out.add(toks(i) + " " + toks(i+1) + " " + toks(i+2)); i += 1 }
    out.toSeq
  } else Seq(toks.mkString(" "))
}
val shUdf = docs.select(col("doc_id"), explode(shingleUdf(col("text"))).as("sh"))
time("udf_shingles_1st") { shUdf.count() }
time("udf_shingles_2nd") { shUdf.count() }

val toks = docs.select(col("doc_id"), graft.functions.TextOps.tokens(col("text")).as("toks"))
time("tokens_only_warm") { toks.select(explode(col("toks"))).count() }
time("tokens_only_warm2") { toks.select(explode(col("toks"))).count() }
System.exit(0)
