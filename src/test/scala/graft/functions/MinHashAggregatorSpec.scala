package graft.functions

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinHashAggregatorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("UDAF over exploded shingles equals the fused per-row UDF signature") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs today"),
      (3L, "ab")
    ).toDF("doc_id", "text")

    // UDAF path: explode shingles, aggregate per doc (map-side partial).
    val agg = udaf(MinHashAggregator)
    val viaUdaf = docs
      .select(col("doc_id"), explode(TextOps.shingles3Udf(col("text"))).as("sh"))
      .groupBy(col("doc_id"))
      .agg(agg(col("sh")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

    // Fused-UDF path: bands are the 4-grouped concat of the same mins.
    val viaUdf = docs
      .select(col("doc_id"), TextOps.minhashBandsUdf(col("text")).as("bands"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

    viaUdaf.foreach { case (id, sig) =>
      assert(sig.length == 16)
      val bandsFromSig = (0 until 4).map(b => (4 * b until 4 * b + 4).map(sig(_)).mkString("_"))
      assert(bandsFromSig == viaUdf(id), s"doc $id signature mismatch")
    }
  }
}
