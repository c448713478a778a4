package graft.operators

import graft.Tables
import graft.functions.VectorOps
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The trained coarse quantizer ([[AnnIndex.kmeans]]) must beat the
  * 16-corpus-vector stand-in on the two axes that matter for an IVF
  * index at scale, measured on the sf0.1 embeddings:
  *   - cell balance (max/mean bucket size — skewed cells are the
  *     straggler source at 100 TB);
  *   - recall@3 at nprobe=2 against the exact top-k ground truth.
  * Plus: fixed k survives training (empty cells keep their previous
  * centroid), training is deterministic across runs (hash-seeded, no
  * rand()), and the result drops into `AnnIndex.init`'s quantizer seam.
  */
class AnnKMeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.1"

  private def balance(e: DataFrame, cents: DataFrame): Double = {
    val sizes = AnnIndex.assign(e, cents).groupBy("cell").count()
    val row = sizes.agg(max(col("count")).cast("double"), avg(col("count"))).head()
    row.getDouble(0) / row.getDouble(1)
  }

  /** recall@3, nprobe=2, queries vec_id<10, self excluded — the exact
    * ground truth is the brute-force top-3 over the same universe.
    */
  private def recallAt3(e: DataFrame, cents: DataFrame): Double = {
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val approx = AnnIndex.searchAssigned(
      AnnIndex.assign(e, cents), AnnIndex.probe(queries, cents, nprobe = 2), k = 3)
      .select("q_id", "vec_id")
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        VectorOps.cosineScore(col("embedding"), col("qv")).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("q_id", "vec_id")
    approx.join(exact, Seq("q_id", "vec_id"), "left_semi").count().toDouble / exact.count()
  }

  test("trained k-means beats the stand-in on cell balance AND recall@3 (sf0.1)") {
    val e = Tables.embeddings(spark, d)
    val standIn = AnnIndex.centroids(e)
    val trained = AnnIndex.kmeans(e)
    assert(trained.count() === 16L, "k must survive training (empty-cell carry-forward)")

    val (bStand, bTrained) = (balance(e, standIn), balance(e, trained))
    val (rStand, rTrained) = (recallAt3(e, standIn), recallAt3(e, trained))
    info(f"balance max/mean: stand-in $bStand%.3f vs trained $bTrained%.3f")
    info(f"recall@3 nprobe=2: stand-in $rStand%.3f vs trained $rTrained%.3f")
    assert(bTrained < bStand,
      f"trained cells should be better balanced: $bTrained%.3f !< $bStand%.3f")
    assert(rTrained > rStand,
      f"trained recall should improve: $rTrained%.3f !> $rStand%.3f")
  }

  test("k-means is deterministic across invocations (hash-seeded, no rand())") {
    val e = Tables.embeddings(spark, d)
    val a = AnnIndex.kmeans(e, k = 8, iters = 3)
      .select(col("c_id"), col("cv").as("cv_a"))
    val b = AnnIndex.kmeans(e, k = 8, iters = 3)
      .select(col("c_id"), col("cv").as("cv_b"))
    val joined = a.join(b, Seq("c_id"), "full_outer")
    assert(joined.filter(col("cv_a").isNull || col("cv_b").isNull).count() === 0L)
    // identical up to float-summation jitter in the distributed means
    val maxDiff = joined
      .select(aggregate(zip_with(col("cv_a"), col("cv_b"),
        (x, y) => abs(x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => greatest(acc, v)).as("md"))
      .agg(max(col("md"))).head().getDouble(0)
    assert(maxDiff < 1e-6, s"centroids drifted across runs: $maxDiff")
  }

  test("centroid ids survive the GlobalLimit regime (topKSortFallbackThreshold)") {
    // ADVICE r16: seed ranks came from zipWithIndex over the post-limit
    // RDD, which is order-stable only while Catalyst lowers sort+limit
    // to TakeOrderedAndProject; past topKSortFallbackThreshold the
    // GlobalLimit shuffle keeps rows but not order. The fix re-sorts
    // the k-row sliver physically — so forcing the fallback regime must
    // yield byte-identical centroid ids.
    val e = Tables.embeddings(spark, d)
    val conf = "spark.sql.execution.topKSortFallbackThreshold"
    val prev = spark.conf.get(conf)
    val normal = AnnIndex.kmeans(e, k = 8, iters = 1)
      .select(col("c_id"), col("cv").as("cv_a"))
    val fallback =
      try { spark.conf.set(conf, "1"); AnnIndex.kmeans(e, k = 8, iters = 1) }
      finally spark.conf.set(conf, prev)
    val joined = normal.join(fallback.select(col("c_id"), col("cv").as("cv_b")),
      Seq("c_id"), "full_outer")
    assert(joined.filter(col("cv_a").isNull || col("cv_b").isNull).count() === 0L,
      "same c_id set under both physical limit forms")
    val maxDiff = joined
      .select(aggregate(zip_with(col("cv_a"), col("cv_b"),
        (x, y) => abs(x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => greatest(acc, v)).as("md"))
      .agg(max(col("md"))).head().getDouble(0)
    assert(maxDiff < 1e-6, s"centroid ids/values drifted under GlobalLimit: $maxDiff")
  }

  test("oracled ann_recall_trained beats the stand-in's ann_recall ivf rows (sf0.01)") {
    // the driver-gated rows, compared at the gate's own scale: a kmeans
    // regression must now fail CORRECTNESS, not just this suite
    val d01 = "/root/testdata/sf0.01"
    def meanRecall(df: org.apache.spark.sql.DataFrame, method: String): Double =
      df.filter(col("method") === method).agg(avg(col("recall3"))).head().getDouble(0)
    val trained = meanRecall(graft.SparkEntry.queries("ann_recall_trained")(spark, d01), "ivf_trained")
    val standIn = meanRecall(graft.SparkEntry.queries("ann_recall")(spark, d01), "ivf")
    info(f"sf0.01 recall@3 nprobe=2: stand-in $standIn%.3f vs trained $trained%.3f")
    assert(trained >= standIn,
      f"trained quantizer recall must be at least the stand-in's: $trained%.3f !>= $standIn%.3f")
  }

  test("kmeans output drops into AnnIndex.init's quantizer seam") {
    val e = Tables.embeddings(spark, d)
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-kmeans").toString
    AnnIndex.init(e, dir, quantizer = Some(AnnIndex.kmeans(e)))
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val res = AnnIndex.search(spark, dir, queries, nprobe = 2, k = 3)
    assert(res.count() === 15L, "3 hits per query over the trained index")
  }
}
