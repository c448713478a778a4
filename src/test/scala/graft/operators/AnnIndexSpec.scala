package graft.operators

import graft.Tables
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF index pinned to the inline `ann_ivf_topk` query:
  *   1. searching the parquet-backed index returns exactly the inline
  *      query's result;
  *   2. `addBatch` over new vectors leaves the inverted file identical
  *      (as a multiset) to a from-scratch rebuild's — and re-running the
  *      same addBatch (the crash-retry path) changes nothing;
  *   3. search over the grown index equals search over a rebuilt one.
  */
class AnnIndexSpec extends AnyFunSuite {
  import TableAssertions.assertSameTable
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def cells(dir: String): DataFrame =
    spark.read.parquet(s"$dir/cells").select("vec_id", "embedding", "cell")

  test("persisted IVF search == inline ann_ivf_topk; addBatch == rebuild; retry idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-index").toString
    val e = Tables.embeddings(spark, d)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))

    // 1. persisted == inline (the oracled queries) — both the cosine
    //    path and the stored-int8-codes path
    AnnIndex.init(e, dir)
    assertSameTable(
      AnnIndex.search(spark, dir, queries, nprobe = 2, k = 3).orderBy("q_id", "rnk"),
      graft.SparkEntry.queries("ann_ivf_topk")(spark, d),
      "persisted vs inline IVF top-k")
    assertSameTable(
      AnnIndex.searchInt8(spark, dir, queries, nprobe = 2, k = 3).orderBy("q_id", "rnk"),
      graft.SparkEntry.queries("ann_ivf_int8")(spark, d),
      "stored-codes vs inline IVF int8 top-k")
    assertSameTable(
      AnnIndex.cellStats(spark, dir),
      graft.SparkEntry.queries("ann_ivf_cell_stats")(spark, d),
      "stored cell-health card vs inline query")

    // 2. growing the index by a batch == rebuilding over the grown
    //    corpus, and the landing is retry-idempotent. The base corpus
    //    keeps the centroid vectors (100-115) so stored centroids match
    //    the rebuilt quantizer.
    val base = e.filter(col("vec_id") % 7 =!= 3 || col("vec_id").between(100, 115))
    val batch = e.filter(col("vec_id") % 7 === 3 && !col("vec_id").between(100, 115))
    val growDir = java.nio.file.Files.createTempDirectory("graft-ann-grow").toString
    AnnIndex.init(base, growDir)
    AnnIndex.addBatch(spark, batch, growDir, batchId = 1L)
    AnnIndex.addBatch(spark, batch, growDir, batchId = 1L) // simulated crash-retry
    val rebuiltDir = java.nio.file.Files.createTempDirectory("graft-ann-rebuild").toString
    AnnIndex.init(e, rebuiltDir)
    assertSameTable(cells(growDir), cells(rebuiltDir), "grown vs rebuilt inverted file")

    // 3. search over grown == search over rebuilt
    assertSameTable(
      AnnIndex.search(spark, growDir, queries, nprobe = 2, k = 3),
      AnnIndex.search(spark, rebuiltDir, queries, nprobe = 2, k = 3),
      "search results (grown vs rebuilt)")
    assert(batch.count() > 0)
  }

  test("search scan is dynamically pruned to the probed cells") {
    // the inverted file is partitioned by cell; the probe join must
    // plan as dynamic partition pruning so a search reads only the
    // nprobe probed cells' directories, not the whole table — THE
    // property that makes the stored IVF form pay at 100 TB
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-dpp").toString
    val e = Tables.embeddings(spark, d)
    AnnIndex.init(e, dir)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val res = AnnIndex.search(spark, dir, queries, nprobe = 2, k = 3)
    res.collect() // settle AQE on the final plan
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(1200))
  }
}
