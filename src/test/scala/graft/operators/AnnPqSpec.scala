package graft.operators

import graft.Tables
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization invariants:
  *   1. code well-formedness: every vector carries exactly M codes in
  *      [0, K) — the argmin can never drop a subspace or emit an
  *      out-of-codebook id;
  *   2. self-coding: a vector that IS a codebook entry must encode to
  *      its own entry id in every subspace (its subspace distance to
  *      itself is exactly 0.0, and ties break toward the smaller id —
  *      entry vectors are distinct here);
  *   3. ADC ordering sanity: for a query that is itself a corpus
  *      vector, the integer ADC score of a vector sharing all M codes
  *      with the query ranks it above any vector sharing none (the
  *      lookup table is built from the same codebooks);
  *   4. partition invariance: the ranked output is identical under a
  *      different input partitioning (the hash-gate requirement).
  */
class AnnPqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("codes are well-formed: M codes per vector, each in [0, K)") {
    val e = Tables.embeddings(spark, d)
    val codes = AnnPq.encode(e, AnnPq.codebooks(e))
    assert(codes.count() == e.count(), "one wide code row per vector")
    val bad = codes.filter(
      (0 until AnnPq.M).map(m =>
        col(s"c$m").isNull || col(s"c$m") < 0 || col(s"c$m") >= AnnPq.K)
        .reduce(_ || _))
    assert(bad.isEmpty, "all codes must be present and in [0, K)")
  }

  test("codebook entry vectors encode to their own entry id") {
    val e = Tables.embeddings(spark, d)
    val codes = AnnPq.encode(e, AnnPq.codebooks(e))
      .filter(col("vec_id").between(100, 100 + AnnPq.K - 1))
    val selfCoded = codes.filter(
      (0 until AnnPq.M).map(m => col(s"c$m") === (col("vec_id") - 100))
        .reduce(_ && _))
    assert(selfCoded.count() == AnnPq.K.toLong,
      "each codebook source vector must be its own nearest entry in every subspace")
  }

  test("a codebook vector queried against the corpus ranks itself... via its twin codes") {
    // query with vec_id=105's embedding under a q_id outside the corpus id
    // space: the top hit must be vec_id 105 itself (identical codes give
    // the maximal ADC for this LUT... up to integer ties, which break by
    // vec_id; 105 shares its codes only with itself on this corpus slice)
    val e = Tables.embeddings(spark, d)
    val q = e.filter(col("vec_id") === 105)
      .select(lit(-1L).as("q_id"), col("embedding").as("qv"))
    val top = AnnPq.search(e, q, k = 1).select("vec_id").collect().map(_.getLong(0))
    assert(top.headOption.contains(105L), s"expected self as top-1, got ${top.toSeq}")
  }

  test("ranked output is partition-invariant") {
    val e = Tables.embeddings(spark, d)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val a = AnnPq.search(e, queries, k = 3).collect().map(_.toSeq).toSeq
    val b = AnnPq.search(e.repartition(7), queries.repartition(3), k = 3)
      .collect().map(_.toSeq).toSeq
    assert(a == b, "ADC ranking must not depend on partitioning")
  }
}
