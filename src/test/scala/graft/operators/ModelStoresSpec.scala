package graft.operators

import graft.Tables
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted trained-artifact stores against their inline
  * derivations (the SourceSketch discipline): batch-folded sufficient
  * statistics must reproduce the one-pass corpus model EXACTLY — the
  * NB counts/priors and the BPE word frequencies are sum-monoids over
  * disjoint doc batches — and serving (model table, doc scores, merge
  * table) from the store must equal the oracled inline queries.
  */
class ModelStoresSpec extends AnyFunSuite {
  import TableAssertions.assertSameTable
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def batches = {
    val docs = Tables.documents(spark, d)
    (docs,
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
  }

  test("NB store: batch-folded model == inline; stored scoring == inline scores") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nb-store").toString
    val (docs, b0, b1, b2) = batches
    NbModelStore.init(b0, dir)
    NbModelStore.addBatch(b1, dir, 1L)
    NbModelStore.addBatch(b2, dir, 2L)

    // served model == the oracled inline relation
    assertSameTable(NbModelStore.model(spark, dir),
      graft.SparkEntry.queries("quality_classifier_model")(spark, d),
      "stored model vs inline quality_classifier_model")

    // stored-artifact scoring == the inline classifier's scores
    val inline = graft.SparkEntry.queries("quality_classifier")(spark, d)
      .select(col("doc_id"), col("score"))
    assertSameTable(NbModelStore.score(spark, dir, docs).orderBy("doc_id"),
      inline.orderBy("doc_id"), "stored scoring vs inline scores")

    // crash-retry: re-landing a batch overwrites its own partition
    NbModelStore.addBatch(b1, dir, 1L)
    assertSameTable(NbModelStore.model(spark, dir),
      graft.SparkEntry.queries("quality_classifier_model")(spark, d),
      "re-added batch is a no-op")

    // MONOID compaction (r15): served model unchanged AND the stored
    // tables shrink to their normal forms — ≤64 count rows, ONE priors
    // row — independent of batch count
    NbModelStore.compact(spark, dir)
    assertSameTable(NbModelStore.model(spark, dir),
      graft.SparkEntry.queries("quality_classifier_model")(spark, d),
      "model after compaction")
    assert(spark.read.parquet(s"$dir/counts").count() <= 64,
      "compacted counts at monoid normal form")
    assert(spark.read.parquet(s"$dir/priors").count() == 1,
      "compacted priors fold to one row")
  }

  test("Lang store: batch-folded model == inline; stored scoring == inline predictions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lang-store").toString
    val (docs, b0, b1, b2) = batches
    LangModelStore.init(b0, dir)
    LangModelStore.addBatch(b1, dir, 1L)
    LangModelStore.addBatch(b2, dir, 2L)

    // served model == the oracled inline relation
    assertSameTable(LangModelStore.model(spark, dir),
      graft.SparkEntry.queries("lang_classifier_model")(spark, d),
      "stored model vs inline lang_classifier_model")

    // stored-artifact scoring == the inline classifier's predictions
    val inline = graft.SparkEntry.queries("lang_classifier")(spark, d)
      .select(col("doc_id"), col("pred_lang"), col("score"))
    assertSameTable(LangModelStore.score(spark, dir, docs).orderBy("doc_id"),
      inline.orderBy("doc_id"), "stored scoring vs inline predictions")

    // crash-retry: re-landing a batch overwrites its own partition
    LangModelStore.addBatch(b1, dir, 1L)
    assertSameTable(LangModelStore.model(spark, dir),
      graft.SparkEntry.queries("lang_classifier_model")(spark, d),
      "re-added batch is a no-op")

    // compaction folds partitions without changing the served model
    LangModelStore.compact(spark, dir)
    assertSameTable(LangModelStore.model(spark, dir),
      graft.SparkEntry.queries("lang_classifier_model")(spark, d),
      "model after compaction")
  }

  test("BPE store: batch-folded counts serve the inline merge table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-store").toString
    val (docs, b0, b1, b2) = batches
    BpeStatsStore.init(b0, dir)
    BpeStatsStore.addBatch(b1, dir, 1L)
    BpeStatsStore.addBatch(b2, dir, 2L)

    // folded counts == one-pass corpus counts
    assertSameTable(BpeStatsStore.read(spark, dir),
      BpeStatsStore.counts(docs), "stored fold vs one-pass counts")

    // served merge table == the oracled inline relation
    assertSameTable(BpeStatsStore.mergesRel(spark, dir),
      graft.SparkEntry.queries("bpe_merges")(spark, d),
      "stored merges vs inline bpe_merges")

    // idempotent re-add + compaction invariance
    BpeStatsStore.addBatch(b2, dir, 2L)
    BpeStatsStore.compact(spark, dir)
    assertSameTable(BpeStatsStore.mergesRel(spark, dir),
      graft.SparkEntry.queries("bpe_merges")(spark, d),
      "merges after re-add + compaction")
  }
}
