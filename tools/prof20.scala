// Round-7 probe (VERDICT #3, part 4): LSH-signature-bucket seeding —
// seeds drawn one per largest signature bucket are spread across
// halfspaces by construction, so Lloyd's needs fewer rounds than the
// arbitrary md5-hash seeding. Measures recall@3 at sf0.01 for
// iters 0/1/2/3 under bucket seeding, and sf0.1 timing.
//
// Run: /opt/spark/bin/spark-shell --master local[32] \
//   --conf spark.sql.shuffle.partitions=32 --driver-memory 8g \
//   -cp target/scala-2.13/classes -I tools/prof20.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorOps
import graft.operators.{AnnIndex, AnnQueries}

// seeds: one representative (min seed-hash, then min vec_id) from each
// of the k most populated signature buckets (ties: smaller sig);
// c_id = bucket rank
def lshSeeds(embeddings: DataFrame, k: Int): DataFrame = {
  val signed = embeddings
    .select(col("vec_id"), col("embedding"))
    .filter(VectorOps.norm2(col("embedding")) > 0)
    .withColumn("sig", AnnQueries.signatureUdf()(col("embedding")))
  val seedKey = md5(concat(lit("seed:"), col("vec_id").cast("string")).cast("binary"))
  val perSig = Window.partitionBy(col("sig")).orderBy(seedKey, col("vec_id"))
  val rep = signed
    .withColumn("rn", row_number().over(perSig))
    .filter(col("rn") === 1)
    .drop("rn")
  val bySize = signed.groupBy(col("sig")).agg(count(lit(1)).as("n"))
  val rank = Window.orderBy(col("n").desc, col("sig"))
  rep.join(bySize, Seq("sig"))
    .withColumn("c_id", (row_number().over(rank) - 1).cast("long"))
    .filter(col("c_id") < k)
    .select(col("c_id"), col("embedding").as("cv"))
}

def kmeansSeeded(embeddings: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
  graft.expressions.GraftFunctions.register(embeddings.sparkSession)
  val base = embeddings.select(col("vec_id"), col("embedding")).localCheckpoint()
  var cents = seeds.localCheckpoint()
  for (r <- 1 to iters) {
    val means = AnnIndex.assign(base, cents)
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("x").cast("double")).as("m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell").as("c_id"),
        transform(col("pm"), p => p.getField("m")).as("mv"))
    val normed = means
      .withColumn("n", sqrt(VectorOps.norm2(col("mv"))))
      .select(col("c_id"),
        when(col("n") > 0, transform(col("mv"), v => (v / col("n")).cast("float")))
          .otherwise(transform(col("mv"), v => v.cast("float"))).as("cv_new"))
    val next = cents.join(normed, Seq("c_id"), "left")
      .select(col("c_id"), coalesce(col("cv_new"), col("cv")).as("cv"))
    cents = if (r % 2 == 0 || r == iters) next.localCheckpoint() else next
  }
  cents
}

def recallMean(d: String, iters: Int): Double = {
  val e = graft.Tables.embeddings(spark, d)
  val q = e.filter(col("vec_id") < 10)
    .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
  val cents = kmeansSeeded(e, lshSeeds(e, 16), iters)
  val approx = AnnIndex.searchAssigned(
    AnnIndex.assign(e, cents), AnnIndex.probe(q, cents, nprobe = 2), k = 3)
  val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
  val truth = e.crossJoin(broadcast(q))
    .filter(col("vec_id") =!= col("q_id"))
    .select(col("q_id"), col("vec_id"),
      VectorOps.cosineScore(col("embedding"), col("qv")).as("score"))
    .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
    .select(col("q_id"), col("vec_id"))
  val hits = approx.select("q_id", "vec_id")
    .join(truth, Seq("q_id", "vec_id"), "left_semi")
    .groupBy("q_id").agg(count(lit(1)).as("hits"))
  q.select(col("q_id")).join(hits, Seq("q_id"), "left")
    .agg(avg(coalesce(col("hits"), lit(0L)).cast("double") / 3.0)).head().getDouble(0)
}

for (it <- Seq(0, 1, 2, 3)) {
  val r = recallMean("/root/testdata/sf0.01", it)
  println(f"[prof20] lsh-seeded iters=$it sf0.01 mean recall@3 = $r%.4f")
}

def timeIt(label: String)(f: => Long): Double = {
  val t0 = System.nanoTime(); val n = f
  val s = (System.nanoTime() - t0) / 1e9
  println(f"[prof20] $label%-48s $s%7.2fs (rows=$n)"); s
}
val d01 = "/root/testdata/sf0.1"
val e01 = graft.Tables.embeddings(spark, d01)
e01.count()
def fullQuery(iters: Int): Long = {
  val e = e01
  val q = e.filter(col("vec_id") < 10)
    .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
  val cents = kmeansSeeded(e, lshSeeds(e, 16), iters)
  val approx = AnnIndex.searchAssigned(
    AnnIndex.assign(e, cents), AnnIndex.probe(q, cents, nprobe = 2), k = 3)
  val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
  val truth = e.crossJoin(broadcast(q))
    .filter(col("vec_id") =!= col("q_id"))
    .select(col("q_id"), col("vec_id"),
      VectorOps.cosineScore(col("embedding"), col("qv")).as("score"))
    .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
    .select(col("q_id"), col("vec_id"))
  approx.select("q_id", "vec_id").join(truth, Seq("q_id", "vec_id"), "left_semi").count()
}
fullQuery(1) // warm
for (it <- Seq(0, 1, 2)) {
  (1 to 2).foreach(_ => timeIt(s"sf0.1 full-recall-query lsh-seeded iters=$it") { fullQuery(it) })
}
sys.exit(0)
