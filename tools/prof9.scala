// Measure: rare-shingle filtering via groupBy+join (current) vs a
// count-over-window (one shuffle instead of two) inside the
// cappedPairScores path, sf0.1.
// Run: spark-shell --master 'local[32]' -cp target/scala-2.13/classes -I tools/prof9.scala
// NOTE: REPL evaluates line by line — every statement stays on one line.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
spark.conf.set("spark.sql.shuffle.partitions", "32")
val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
def shingleRel() = docs.repartition(32).select(col("doc_id"), graft.functions.TextOps.shingles3Udf(col("text")).as("shs")).select(col("doc_id"), size(col("shs")).cast("long").as("n_sh"), explode(col("shs")).as("sh"))
def pathA(): Long = { val sh = shingleRel().persist(); val rare = sh.groupBy(col("sh")).agg(count(lit(1)).as("df")).filter(col("df") <= 10).select(col("sh")); val shRare = sh.join(rare, Seq("sh")); val c = shRare.select(col("doc_id").as("doc_a"), col("sh")).join(shRare.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh")).filter(col("doc_a") < col("doc_b")).count(); sh.unpersist(); c }
def pathB(): Long = { val sh = shingleRel().persist(); val shRare = sh.withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh")))).filter(col("df") <= 10).drop("df"); val c = shRare.select(col("doc_id").as("doc_a"), col("sh")).join(shRare.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh")).filter(col("doc_a") < col("doc_b")).count(); sh.unpersist(); c }
def time(tag: String, f: () => Long): Unit = { val t0 = System.nanoTime(); val n = f(); println(s"$tag: $n rows in ${(System.nanoTime() - t0) / 1e9}%s".replace("%s", "s")) }
time("warmup A", pathA)
time("A groupBy+join", pathA)
time("B window", pathB)
time("A groupBy+join (2)", pathA)
time("B window (2)", pathB)
System.exit(0)
