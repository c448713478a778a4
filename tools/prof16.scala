// Round-6 probe: where does ann_recall_trained's ~2.4 s go, and does a
// fused per-cell mean (ONE groupBy(cell) with 64 avg(element_at)
// columns) beat kmeans' posexplode + (cell,pos)-agg + (cell)-agg
// two-shuffle mean? Also checks the two variants agree to float
// tolerance (the oracle replays the mean per-position, which is
// arithmetic-order-insensitive up to the analyzed 1e-16 jitter).
//
// Run: /opt/spark/bin/spark-shell --master local[32] \
//   --conf spark.sql.shuffle.partitions=32 --driver-memory 8g \
//   -cp target/scala-2.13/classes -I tools/prof16.scala
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorOps
import graft.operators.AnnIndex

val d = "/root/testdata/sf0.1"
val e = graft.Tables.embeddings(spark, d)
e.count()

def timeIt(label: String)(f: => Long): Double = {
  val t0 = System.nanoTime()
  val n = f
  val s = (System.nanoTime() - t0) / 1e9
  println(f"[prof16] $label%-44s $s%7.2fs (rows=$n)")
  s
}

def kmeansFused(embeddings: DataFrame, k: Int = 16, iters: Int = 5, dim: Int = 64): DataFrame = {
  graft.expressions.GraftFunctions.register(embeddings.sparkSession)
  def seedKey = md5(concat(lit("seed:"), col("vec_id").cast("string")).cast("binary"))
  val hashOrd = Window.orderBy(seedKey, col("vec_id"))
  var cents = embeddings
    .select(col("vec_id"), col("embedding"))
    .filter(VectorOps.norm2(col("embedding")) > 0)
    .groupBy(col("embedding")).agg(min(col("vec_id")).as("vec_id"))
    .orderBy(seedKey, col("vec_id")).limit(k)
    .select((row_number().over(hashOrd) - 1).cast("long").as("c_id"),
      col("embedding").as("cv"))
    .localCheckpoint()
  for (_ <- 1 to iters) {
    val aggs = (0 until dim).map(i =>
      avg(element_at(col("embedding"), i + 1).cast("double")).as(s"m$i"))
    val means = AnnIndex.assign(embeddings, cents)
      .groupBy(col("cell"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("cell").as("c_id"),
        array((0 until dim).map(i => col(s"m$i")): _*).as("mv"))
    val normed = means
      .withColumn("n", sqrt(VectorOps.norm2(col("mv"))))
      .select(col("c_id"),
        when(col("n") > 0, transform(col("mv"), v => (v / col("n")).cast("float")))
          .otherwise(transform(col("mv"), v => v.cast("float"))).as("cv_new"))
    cents = cents.join(normed, Seq("c_id"), "left")
      .select(col("c_id"), coalesce(col("cv_new"), col("cv")).as("cv"))
      .localCheckpoint()
  }
  cents
}

// warm both paths, then best-of-2
AnnIndex.kmeans(e).count(); kmeansFused(e).count()
val cur = (1 to 2).map(_ => timeIt("kmeans current (posexplode 2-shuffle)") { AnnIndex.kmeans(e).count() }).min
val fus = (1 to 2).map(_ => timeIt("kmeans fused (64-col single-shuffle agg)") { kmeansFused(e).count() }).min
val full = (1 to 2).map(_ => timeIt("full ann_recall_trained query") {
  graft.SparkEntry.queries("ann_recall_trained")(spark, d).count()
}).min
println(f"[prof16] best: current=$cur%.2f fused=$fus%.2f full_query=$full%.2f")

val a = AnnIndex.kmeans(e).select(col("c_id"), col("cv").as("a"))
val b = kmeansFused(e).select(col("c_id"), col("cv").as("b"))
val md = a.join(b, Seq("c_id"))
  .select(aggregate(zip_with(col("a"), col("b"),
    (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
      abs(x.cast("double") - y.cast("double"))), lit(0.0),
    (acc: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) => greatest(acc, v)).as("dd"))
  .agg(max(col("dd"))).head().getDouble(0)
println(s"[prof16] max centroid diff current-vs-fused: $md")
sys.exit(0)
