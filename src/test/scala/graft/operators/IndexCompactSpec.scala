package graft.operators

import graft.Tables
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Small-file hygiene for the persisted indexes (VERDICT r5 #6): after
  * many accepted batches, `compact` must fold every `batch_id=N`
  * partition into ONE partition at the HIGH-WATER batch id (ADVICE r6:
  * folding into 0 would erase the high-water mark the relay's
  * stale-checkpoint guard reads, letting a wrong-checkpoint restart
  * silently overwrite the folded corpus) without changing a single
  * query answer — IVF search, int8 search, and the dedup decision are
  * all pinned across the fold.
  */
class IndexCompactSpec extends AnyFunSuite {
  import TableAssertions.assertSameTable
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def batchDirs(path: String) =
    new java.io.File(path).listFiles().count(_.getName.startsWith("batch_id="))

  private def batchIdSet(path: String) =
    graft.BatchSink.batchIds(spark, path).toSet

  test("AnnIndex.compact folds batches; search and searchInt8 identical") {
    val e = Tables.embeddings(spark, d)
    val dir = tmp("graft-ivf-compact")
    // keep the stand-in centroid ids (100-115) in the init slice
    AnnIndex.init(e.filter(col("vec_id") % 3 === 0 || col("vec_id").between(100, 115)), dir)
    AnnIndex.addBatch(spark, e.filter(col("vec_id") % 3 === 1 && !col("vec_id").between(100, 115)), dir, 1L)
    AnnIndex.addBatch(spark, e.filter(col("vec_id") % 3 === 2 && !col("vec_id").between(100, 115)), dir, 2L)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val before = AnnIndex.search(spark, dir, queries, nprobe = 2, k = 3)
    val before8 = AnnIndex.searchInt8(spark, dir, queries, nprobe = 2, k = 3)
    val (b, b8) = (before.collect().map(_.toSeq).toSet, before8.collect().map(_.toSeq).toSet)
    assert(batchDirs(s"$dir/cells") === 3)
    AnnIndex.compact(spark, dir)
    assert(batchIdSet(s"$dir/cells") === Set(2L),
      "all batches folded into the high-water id, preserving the relay guard's mark")
    assert(AnnIndex.search(spark, dir, queries, nprobe = 2, k = 3)
      .collect().map(_.toSeq).toSet === b, "IVF search changed across compaction")
    assert(AnnIndex.searchInt8(spark, dir, queries, nprobe = 2, k = 3)
      .collect().map(_.toSeq).toSet === b8, "int8 search changed across compaction")
  }

  test("DedupIndex.compact folds batches; the dedup decision is identical") {
    val docs = Tables.documents(spark, d).select("doc_id", "text")
    val dir = tmp("graft-dedup-compact")
    DedupIndex.init(docs.filter(col("doc_id") % 3 === 0), dir)
    DedupIndex.accept(
      DedupIndex.dedupBatch(spark, dir, docs.filter(col("doc_id") % 3 === 1), batchId = 1L),
      dir, batchId = 1L)
    val incoming = docs.filter(col("doc_id") % 3 === 2)
    val before = DedupIndex.dedupBatch(spark, dir, incoming).select("doc_id")
    val b = before.collect().map(_.getLong(0)).toSet
    assert(batchDirs(s"$dir/fp") === 2)
    DedupIndex.compact(spark, dir)
    assert(batchIdSet(s"$dir/fp") === Set(1L), "fp folded into the high-water id")
    assert(batchIdSet(s"$dir/bands") === Set(1L), "bands folded into the high-water id")
    val after = DedupIndex.dedupBatch(spark, dir, incoming).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(after === b, "dedup decision changed across compaction")
  }
}
