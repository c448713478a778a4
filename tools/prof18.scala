// Round-7 probe (VERDICT #3, part 2): does TRAINING ON A HASH-SAMPLED
// SLICE (the documented 100 TB practice — assign full corpus against
// centroids trained on corpus/m) keep recall >= 0.4667 at sf0.01 while
// getting the full query under ~1s at sf0.1?  Sample membership =
// first hex char of md5('smp:'||vec_id) — deterministic + DuckDB-replayable.
//
// Run: /opt/spark/bin/spark-shell --master local[32] \
//   --conf spark.sql.shuffle.partitions=32 --driver-memory 8g \
//   -cp target/scala-2.13/classes -I tools/prof18.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.AnnIndex

// sampleCut: keep rows whose first md5 hex char is <= cut ('7' = half,
// '3' = quarter, 'f' = all)
def sampled(e: DataFrame, cut: String): DataFrame =
  e.filter(substring(md5(concat(lit("smp:"), col("vec_id").cast("string")).cast("binary")), 1, 1) <= cut)

def recallMean(d: String, iters: Int, cut: String): Double = {
  val e = graft.Tables.embeddings(spark, d)
  val q = e.filter(col("vec_id") < 10)
    .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
  val cents = AnnIndex.kmeans(sampled(e, cut), 16, iters)
  val approx = AnnIndex.searchAssigned(
    AnnIndex.assign(e, cents), AnnIndex.probe(q, cents, nprobe = 2), k = 3)
  val w = org.apache.spark.sql.expressions.Window
    .partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
  val truth = e.crossJoin(broadcast(q))
    .filter(col("vec_id") =!= col("q_id"))
    .select(col("q_id"), col("vec_id"),
      graft.functions.VectorOps.cosineScore(col("embedding"), col("qv")).as("score"))
    .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
    .select(col("q_id"), col("vec_id"))
  val hits = approx.select("q_id", "vec_id")
    .join(truth, Seq("q_id", "vec_id"), "left_semi")
    .groupBy("q_id").agg(count(lit(1)).as("hits"))
  q.select(col("q_id")).join(hits, Seq("q_id"), "left")
    .agg(avg(coalesce(col("hits"), lit(0L)).cast("double") / 3.0)).head().getDouble(0)
}

for ((it, cut) <- Seq((3, "f"), (3, "7"), (3, "3"), (5, "7"), (2, "7"))) {
  val r = recallMean("/root/testdata/sf0.01", it, cut)
  println(f"[prof18] iters=$it cut=$cut sf0.01 mean recall@3 = $r%.4f")
}

def timeIt(label: String)(f: => Long): Double = {
  val t0 = System.nanoTime(); val n = f
  val s = (System.nanoTime() - t0) / 1e9
  println(f"[prof18] $label%-44s $s%7.2fs (rows=$n)"); s
}

val d01 = "/root/testdata/sf0.1"
val e01 = graft.Tables.embeddings(spark, d01)
e01.count()

def fullQuery(iters: Int, cut: String): Long = {
  val e = e01
  val q = e.filter(col("vec_id") < 10)
    .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
  val cents = AnnIndex.kmeans(sampled(e, cut), 16, iters)
  val approx = AnnIndex.searchAssigned(
    AnnIndex.assign(e, cents), AnnIndex.probe(q, cents, nprobe = 2), k = 3)
  approx.count()
}
fullQuery(3, "7") // warm
for ((it, cut) <- Seq((3, "7"), (3, "3"), (3, "f"))) {
  (1 to 2).foreach(_ => timeIt(s"sf0.1 train+search iters=$it cut=$cut") { fullQuery(it, cut) })
}
sys.exit(0)
