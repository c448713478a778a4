package graft.operators

import graft.Tables
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The LSH plane count is the corpus-size dial (VERDICT r4 #3): at
  * 100 TB bucket population grows linearly with the corpus, and the
  * deployment answer is more planes. This spec pins the properties that
  * make that dial safe to turn:
  *   1. signatures NEST — plane p's hyperplane doesn't depend on the
  *      plane count, so sig at n+m planes masked to n bits == sig at n
  *      planes, and added planes strictly refine existing buckets;
  *   2. therefore the max bucket size is monotonically non-increasing
  *      in the plane count (and actually shrinks on real data);
  *   3. the pair output at more planes is a subset of the output at
  *      fewer planes (refinement can only split candidate blocks);
  *   4. the bucket-stat guard fails LOUDLY when a bucket exceeds its
  *      bound, naming the fix.
  */
class LshScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.1"

  private def sigs(numPlanes: Int) =
    Tables.embeddings(spark, d)
      .select(col("vec_id"), AnnQueries.signatureUdf(numPlanes)(col("embedding")).as("sig"))

  test("signatures nest: sig@12 masked to 8 bits == sig@8 on every row") {
    val merged = sigs(8).withColumnRenamed("sig", "sig8")
      .join(sigs(12).withColumnRenamed("sig", "sig12"), Seq("vec_id"))
    assert(merged.filter((col("sig12").bitwiseAND(lit(255L))) =!= col("sig8")).count() === 0L)
  }

  test("max bucket size is non-increasing in plane count (and shrinks on sf0.1)") {
    def maxBucket(n: Int): Long =
      sigs(n).groupBy("sig").count().agg(max("count")).head().getLong(0)
    val sizes = Seq(6, 8, 10, 12).map(n => n -> maxBucket(n))
    info(sizes.map { case (n, m) => s"planes=$n max=$m" }.mkString(", "))
    sizes.sliding(2).foreach { case Seq((nA, a), (nB, b)) =>
      assert(b <= a, s"refinement violated: planes=$nB max=$b > planes=$nA max=$a")
    }
    assert(sizes.last._2 < sizes.head._2,
      "on real data 6 extra planes should strictly shrink the largest bucket")
  }

  test("near-dup pairs at more planes are a subset of pairs at fewer planes") {
    val e = Tables.embeddings(spark, d)
    val at8 = AnnQueries.lshNearDup(e, numPlanes = 8).select("id_a", "id_b")
    val at12 = AnnQueries.lshNearDup(e, numPlanes = 12).select("id_a", "id_b")
    assert(at12.join(at8, Seq("id_a", "id_b"), "left_anti").count() === 0L)
    assert(at12.count() <= at8.count())
  }

  test("multi-probe recovers the recall that more planes take away") {
    import graft.functions.VectorOps
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, d)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    val exact = e.filter(col("vec_id") >= 20).crossJoin(broadcast(queries))
      .select(col("q_id"), col("vec_id"),
        VectorOps.cosineScore(col("embedding"), col("qv")).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("q_id", "vec_id")
    val truthN = exact.count().toDouble
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      approx.select("q_id", "vec_id").join(exact, Seq("q_id", "vec_id"), "left_semi")
        .count().toDouble / truthN
    // at 12 planes buckets are 16x finer than at 8 — single-probe recall
    // drops; probing across the lowest-margin planes wins it back
    // without touching the bucket-size bound the planes bought
    val single12 = recall(AnnQueries.lshTopK(e, numPlanes = 12))
    val multi12 = recall(AnnQueries.lshTopKMultiProbe(e, numPlanes = 12, nProbes = 4))
    val single8 = recall(AnnQueries.lshTopK(e))
    val multi8 = recall(AnnQueries.lshTopKMultiProbe(e))
    info(f"planes=8:  single=$single8%.3f multi(2)=$multi8%.3f")
    info(f"planes=12: single=$single12%.3f multi(4)=$multi12%.3f")
    assert(multi8 >= single8, "extra probes can only add candidates")
    assert(multi12 >= single12, "extra probes can only add candidates")
    assert(multi12 > single12,
      f"at 12 planes multi-probe should strictly recover recall: $multi12%.3f !> $single12%.3f")
  }

  test("bucket guard fails loudly over the bound, naming the numPlanes fix") {
    def messageChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    // the guard consumes a PRECOMPUTED stats table (persisted at index
    // accept time — AnnLshIndexSpec covers the stored form; here it is
    // recomputed inline), never a per-query corpus re-aggregation
    val e = Tables.embeddings(spark, d)
    val stats = AnnQueries.bucketStats(
      e.withColumn("sig", AnnQueries.signatureUdf(8)(col("embedding"))))
    val ex = intercept[Throwable] {
      AnnQueries.lshNearDup(e, maxBucket = 1, stats = Some(stats)).count()
    }
    assert(messageChain(ex).exists(_.contains("scale numPlanes")),
      s"guard fired without the numPlanes hint: ${messageChain(ex)}")
  }
}
