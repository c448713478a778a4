// Round-7 probe (VERDICT #3): cheapen ann_recall_trained. Measures
// (a) mean trained recall@3 at sf0.01 for kmeans iters 1/2/3/5 — the
// done-criterion is recall >= 0.467, the round-6 five-iteration value;
// (b) wall time of the full recall query at sf0.1 per iters choice.
//
// Run: /opt/spark/bin/spark-shell --master local[32] \
//   --conf spark.sql.shuffle.partitions=32 --driver-memory 8g \
//   -cp target/scala-2.13/classes -I tools/prof17.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, AnnQueries}

def recallMean(d: String, iters: Int): Double = {
  val e = graft.Tables.embeddings(spark, d)
  val q = e.filter(col("vec_id") < 10)
    .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
  val cents = AnnIndex.kmeans(e, 16, iters)
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

for (it <- Seq(1, 2, 3, 5)) {
  val r001 = recallMean("/root/testdata/sf0.01", it)
  println(f"[prof17] iters=$it%d sf0.01 mean recall@3 = $r001%.4f")
}

def timeIt(label: String)(f: => Long): Double = {
  val t0 = System.nanoTime()
  val n = f
  val s = (System.nanoTime() - t0) / 1e9
  println(f"[prof17] $label%-40s $s%7.2fs (rows=$n)")
  s
}

val d01 = "/root/testdata/sf0.1"
val e01 = graft.Tables.embeddings(spark, d01)
e01.count()
for (it <- Seq(2, 5)) {
  AnnIndex.kmeans(e01, 16, it).count() // warm
  (1 to 2).map(_ => timeIt(s"sf0.1 kmeans iters=$it") { AnnIndex.kmeans(e01, 16, it).count() })
}
(1 to 2).map(_ => timeIt("sf0.1 full ann_recall_trained (iters=5)") {
  graft.SparkEntry.queries("ann_recall_trained")(spark, d01).count()
})
sys.exit(0)
