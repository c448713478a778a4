package graft.operators

import graft.Tables
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted PQ store against the oracled inline derivations
  * (VERDICT r12 ask #2): codebooks and codes written once, searches
  * served from the store, must reproduce the three inline PQ queries
  * row-for-row — plus the batch lifecycle (incremental encode against
  * STORED codebooks, re-add idempotency, compaction invariance, torn-
  * swap heal) that makes the store a relay citizen.
  */
class AnnPqStoreSpec extends AnyFunSuite {
  import TableAssertions.assertSameTable
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def e = Tables.embeddings(spark, d)
  private def queriesRel = e.filter(col("vec_id") < 10)
    .select(col("vec_id").as("q_id"), col("embedding").as("qv"))

  test("stored ADC search == inline ann_pq_topk; batch lifecycle invariants") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-store").toString
    // three ingest slices; the FIRST contains the codebook id slice
    // (100..107) so stored codebooks == the inline stand-in
    val b0 = e.filter(col("vec_id") < 150)
    val b1 = e.filter(col("vec_id") >= 150 && col("vec_id") < 300)
    val b2 = e.filter(col("vec_id") >= 300)
    AnnPqStore.init(b0, dir)
    AnnPqStore.addBatch(spark, b1, dir, 1L)
    AnnPqStore.addBatch(spark, b2, dir, 2L)

    val inline = graft.SparkEntry.queries("ann_pq_topk")(spark, d)
    def stored = AnnPqStore.search(spark, dir, queriesRel, k = 3)
      .orderBy("q_id", "rnk")
    assertSameTable(stored, inline, "stored ADC search vs inline ann_pq_topk")

    // crash-retry: re-landing a batch overwrites its own partition
    AnnPqStore.addBatch(spark, b1, dir, 1L)
    assertSameTable(stored, inline, "re-added batch is a no-op")

    // compaction folds code partitions without changing the ranking
    AnnPqStore.compact(spark, dir)
    assertSameTable(stored, inline, "search after compaction")

    // stored codes == one-pass encode of the whole corpus against the
    // stored codebooks (the fold is row-identity)
    assertSameTable(AnnPqStore.readCodes(spark, dir).orderBy("vec_id"),
      AnnPq.encode(e, AnnPqStore.readCodebooks(spark, dir)).orderBy("vec_id"),
      "stored codes vs one-pass encode")
  }

  test("stored IVFADC == inline ann_ivf_pq (codes + cells + centroids all from stores)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq-ivf").toString
    val pqDir = s"$tmp/pq"; val annDir = s"$tmp/ann"
    AnnPqStore.init(e, pqDir)
    AnnIndex.init(e, annDir)
    assertSameTable(
      AnnPqStore.searchInCells(spark, pqDir, annDir, queriesRel, nprobe = 2, k = 3)
        .orderBy("q_id", "rnk"),
      graft.SparkEntry.queries("ann_ivf_pq")(spark, d),
      "stored IVFADC vs inline ann_ivf_pq")
  }

  test("stored residual IVFADC == inline ann_ivf_pq_residual") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq-resid").toString
    val pqDir = s"$tmp/pq"; val annDir = s"$tmp/ann"
    AnnIndex.init(e, annDir)
    // residualize exactly as the inline query does, then store with the
    // centroid-disjoint codebook slice (baseId = 10); maintenance of a
    // residual store residualizes each batch the same way before
    // addBatch — the store is input-shaped by design
    val cents = AnnIndex.centroids(e)
    val asg = AnnIndex.assign(e, cents).select(col("vec_id"), col("cell"))
    val cellCv = cents.select(col("c_id").as("cell"), col("cv"))
    val resid = e.join(asg, Seq("vec_id"))
      .join(broadcast(cellCv), Seq("cell"))
      .select(col("vec_id"),
        zip_with(col("embedding"), col("cv"),
          (x, y) => x.cast("double") - y.cast("double")).as("embedding"))
    AnnPqStore.init(resid, pqDir, baseId = 10L, residual = true)
    // the store records its own space (ADVICE r13): the search path is
    // derived from the marker, not from a caller-supplied flag
    assert(AnnPqStore.storedResidual(spark, pqDir))
    assertSameTable(
      AnnPqStore.searchInCells(spark, pqDir, annDir, queriesRel, nprobe = 2, k = 3)
        .orderBy("q_id", "rnk"),
      graft.SparkEntry.queries("ann_ivf_pq_residual")(spark, d),
      "stored residual IVFADC vs inline ann_ivf_pq_residual")
  }

  test("marker-less store is refused, never guessed; markSpace migrates it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-nomark").toString + "/pq"
    AnnPqStore.init(e.filter(col("vec_id") < 150), dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a pre-marker store: same layout, no space record — could hold
    // either space, so reading the space must throw, not default to raw
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_GRAFT_PQ_SPACE"), false)
    val ex = intercept[IllegalStateException] {
      AnnPqStore.storedResidual(spark, dir)
    }
    assert(ex.getMessage.contains("markSpace"), "refusal must name the migration")
    AnnPqStore.markSpace(spark, dir, residual = false)
    assert(!AnnPqStore.storedResidual(spark, dir))
  }

  test("torn compact swap heals before the next read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-heal").toString
    AnnPqStore.init(e.filter(col("vec_id") < 150), dir)
    AnnPqStore.addBatch(spark, e.filter(col("vec_id") >= 150), dir, 1L)
    val inline = graft.SparkEntry.queries("ann_pq_topk")(spark, d)
    // simulate a crash between replaceTable's two renames: the folded
    // table is fully committed at <codes>.swap (sentinel present) and
    // the live table is gone — readCodes must promote it before reading
    val codes = s"$dir/codes"
    val fs = new org.apache.hadoop.fs.Path(codes)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(codes)
      .write.partitionBy("batch_id").parquet(s"$codes.swap")
    fs.create(new org.apache.hadoop.fs.Path(s"$codes.swap/_GRAFT_COMMIT"), true).close()
    fs.delete(new org.apache.hadoop.fs.Path(codes), true)
    assertSameTable(
      AnnPqStore.search(spark, dir, queriesRel, k = 3).orderBy("q_id", "rnk"),
      inline, "search after torn-swap heal")
  }
}
