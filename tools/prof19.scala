// Round-7 probe (VERDICT #3, part 3): where the remaining
// ann_recall_trained seconds hide. Variants at sf0.1, iters=3:
//   v1 current kmeans loop (re-scans parquet every round, checkpoints
//      centroids every round)
//   v2 + localCheckpoint the training input ONCE (Lloyd's re-reads the
//      same rows every round — the standard cache-the-training-set move)
//   v3 v2 + checkpoint centroids only every 2nd round (lineage doubles
//      per uncheckpointed round: 2 rounds = 4x seed subtree, bounded)
//   v4 v3 + the full query with the corpus checkpointed once and shared
//      by train/assign/truth
//
// Run: /opt/spark/bin/spark-shell --master local[32] \
//   --conf spark.sql.shuffle.partitions=32 --driver-memory 8g \
//   -cp target/scala-2.13/classes -I tools/prof19.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorOps
import graft.operators.AnnIndex

def kmeansV(embeddings: DataFrame, k: Int, iters: Int,
            ckptInput: Boolean, ckptStride: Int): DataFrame = {
  graft.expressions.GraftFunctions.register(embeddings.sparkSession)
  val base0 = embeddings.select(col("vec_id"), col("embedding"))
  val base = if (ckptInput) base0.localCheckpoint() else base0
  def seedKey = md5(concat(lit("seed:"), col("vec_id").cast("string")).cast("binary"))
  val hashOrd = Window.orderBy(seedKey, col("vec_id"))
  var cents = base
    .filter(VectorOps.norm2(col("embedding")) > 0)
    .groupBy(col("embedding")).agg(min(col("vec_id")).as("vec_id"))
    .orderBy(seedKey, col("vec_id")).limit(k)
    .select((row_number().over(hashOrd) - 1).cast("long").as("c_id"),
      col("embedding").as("cv"))
    .localCheckpoint()
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
    cents = if (r % ckptStride == 0 || r == iters) next.localCheckpoint() else next
  }
  cents
}

val d = "/root/testdata/sf0.1"
val e = graft.Tables.embeddings(spark, d)
e.count()

def timeIt(label: String)(f: => Long): Double = {
  val t0 = System.nanoTime(); val n = f
  val s = (System.nanoTime() - t0) / 1e9
  println(f"[prof19] $label%-52s $s%7.2fs (rows=$n)"); s
}

def fullQuery(cents: DataFrame, base: DataFrame): Long = {
  val q = base.filter(col("vec_id") < 10)
    .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
  AnnIndex.searchAssigned(
    AnnIndex.assign(base, cents), AnnIndex.probe(q, cents, nprobe = 2), k = 3).count()
}

kmeansV(e, 16, 3, ckptInput = true, ckptStride = 2).count() // warm
(1 to 2).foreach(_ => timeIt("v1 kmeans iters=3 (current shape)") {
  kmeansV(e, 16, 3, ckptInput = false, ckptStride = 1).count() })
(1 to 2).foreach(_ => timeIt("v2 + input checkpoint") {
  kmeansV(e, 16, 3, ckptInput = true, ckptStride = 1).count() })
(1 to 2).foreach(_ => timeIt("v3 v2 + centroid ckpt stride 2") {
  kmeansV(e, 16, 3, ckptInput = true, ckptStride = 2).count() })
(1 to 2).foreach(_ => timeIt("v3b v2 + NO intermediate ckpt (stride 99)") {
  kmeansV(e, 16, 3, ckptInput = true, ckptStride = 99).count() })
(1 to 2).foreach(_ => timeIt("v4 full query, shared checkpointed corpus") {
  val base = e.select(col("vec_id"), col("embedding"), col("label")).localCheckpoint()
  val cents = kmeansV(base, 16, 3, ckptInput = false, ckptStride = 2)
  fullQuery(cents, base) })
sys.exit(0)
