package graft.operators

import graft.Tables
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted source-overlap sketch against its inline derivation:
  * the whole design rests on the per-source signature being an
  * elementwise-min monoid, so batch-folding a stored table must equal
  * the one-pass corpus computation exactly — and serving the overlap
  * matrix from the store must equal the oracled inline query.
  */
class SourceSketchSpec extends AnyFunSuite {
  import TableAssertions.assertSameTable
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("batch-folded stored sketch == one-pass signatures == inline estimates") {
    val dir = java.nio.file.Files.createTempDirectory("graft-source-sketch").toString
    val docs = Tables.documents(spark, d)
    val b0 = docs.filter(col("doc_id") % 3 === 0)
    val b1 = docs.filter(col("doc_id") % 3 === 1)
    val b2 = docs.filter(col("doc_id") % 3 === 2)

    SourceSketch.init(b0, dir)
    SourceSketch.addBatch(b1, dir, 1L)
    SourceSketch.addBatch(b2, dir, 2L)

    // monoid: fold of per-batch folds == one pass over the union
    assertSameTable(SourceSketch.read(spark, dir),
      SourceSketch.signatures(docs), "stored fold vs one-pass signatures")

    // served matrix == the oracled inline query
    assertSameTable(SourceSketch.estimate(spark, dir),
      graft.SparkEntry.queries("source_overlap_minhash")(spark, d),
      "stored estimate vs inline query")

    // crash-retry: re-landing a batch overwrites its own partition,
    // and min is idempotent — nothing changes
    SourceSketch.addBatch(b1, dir, 1L)
    assertSameTable(SourceSketch.read(spark, dir),
      SourceSketch.signatures(docs), "re-added batch is a no-op")

    // MONOID compaction (r15): folds partitions through the elementwise
    // min — answers unchanged AND the stored table shrinks to its
    // normal form, |sources|·16 rows, independent of batch count (the
    // old row-identity fold grew linearly with batches)
    SourceSketch.compact(spark, dir)
    assertSameTable(SourceSketch.estimate(spark, dir),
      graft.SparkEntry.queries("source_overlap_minhash")(spark, d),
      "estimate after compaction")
    val stored = spark.read.parquet(dir)
    assert(stored.count() ==
      docs.select("source").distinct().count() * 16,
      "compacted sketch is at its monoid normal form (16 rows per source)")
  }
}
