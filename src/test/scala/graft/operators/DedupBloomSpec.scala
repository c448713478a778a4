package graft.operators

import graft.Tables
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bloom-prefiltered increment (DedupIndex.dedupAgainstBloom) is a
  * PLAN-ONLY rewrite of dedupAgainst: blooms have no false negatives, so
  * routing bloom-miss rows around the confirm joins and flipping the
  * remaining joins to broadcast probes must change nothing about the
  * output — only where the exchanges land.
  *
  *   1. parity: bloom form == plain form == the oracled
  *      dedup_incremental relation, at both default and saturated-bloom
  *      sizing (a deliberately undersized bloom raises the
  *      false-positive rate, which must only grow confirm traffic);
  *   2. plan: with size-based broadcasting DISABLED, every join in the
  *      bloom form is still a BroadcastHashJoin (the hints force the
  *      index side to be scanned, never exchanged) while the plain form
  *      degrades to sort-merge — i.e. the bloom form's shape survives
  *      any scale, the plain form's depended on the index being small;
  *   3. stored blooms round-trip next to the index and dedupBatchBloom
  *      == dedupBatch (falling back to the plain pipeline when absent).
  */
class DedupBloomSpec extends AnyFunSuite {
  import TableAssertions.assertSameTable
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def split() = {
    val docs = Tables.documents(spark, d)
    (docs.filter(col("doc_id") % 5 === 0), docs.filter(col("doc_id") % 5 =!= 0))
  }

  test("bloom form == plain form == oracled inline relation") {
    val (incoming, existing) = split()
    val fp = DedupIndex.fingerprints(existing).localCheckpoint()
    val bands = DedupIndex.bandRows(existing).localCheckpoint()
    val plain = DedupIndex.dedupAgainst(incoming, fp, bands)
      .select("doc_id", "fp").orderBy("doc_id")

    val blooms = DedupIndex.buildBlooms(fp, bands)
    val bloomed = DedupIndex.dedupAgainstBloom(incoming, fp, bands, blooms._1, blooms._2)
      .select("doc_id", "fp").orderBy("doc_id")
    assertSameTable(bloomed, plain, "bloom vs plain")

    // saturated sizing: fpp >> nominal, so false positives abound — the
    // confirm joins must absorb every one of them
    val tiny = DedupIndex.buildBlooms(fp, bands, expectedItems = 8L, fpp = 0.5)
    val saturated = DedupIndex.dedupAgainstBloom(incoming, fp, bands, tiny._1, tiny._2)
      .select("doc_id", "fp").orderBy("doc_id")
    assertSameTable(saturated, plain, "saturated bloom vs plain")
  }

  test("all bloom-form joins stay broadcast with size-based broadcasting off") {
    val (incoming, existing) = split()
    val fp = DedupIndex.fingerprints(existing).localCheckpoint()
    val bands = DedupIndex.bandRows(existing).localCheckpoint()
    val blooms = DedupIndex.buildBlooms(fp, bands)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bloomPlan = DedupIndex
        .dedupAgainstBloom(incoming, fp, bands, blooms._1, blooms._2)
        .queryExecution.executedPlan.toString
      assert(!bloomPlan.contains("SortMergeJoin") && !bloomPlan.contains("ShuffledHashJoin"),
        s"bloom form must not shuffle any join side:\n$bloomPlan")
      assert(bloomPlan.contains("BroadcastHashJoin"), "expected broadcast confirm joins")
      // the contrast that motivates the operator: without size-based
      // broadcasting (= any real index size) the plain form shuffles
      val plainPlan = DedupIndex.dedupAgainst(incoming, fp, bands)
        .queryExecution.executedPlan.toString
      assert(plainPlan.contains("SortMergeJoin"),
        "plain form was expected to sort-merge once size-based broadcast is off")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("stored blooms round-trip; dedupBatchBloom == dedupBatch; no bloom -> fallback") {
    val (incoming, existing) = split()
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-bloom").toString
    DedupIndex.init(existing, dir)

    // no bloom on disk yet: fallback path must equal the plain batch
    val viaFallback = DedupIndex.dedupBatchBloom(spark, dir, incoming)
      .select("doc_id", "fp").orderBy("doc_id")
    val viaPlain = DedupIndex.dedupBatch(spark, dir, incoming)
      .select("doc_id", "fp").orderBy("doc_id")
    assertSameTable(viaFallback, viaPlain, "fallback vs plain batch")

    val blooms = DedupIndex.buildBlooms(
      spark.read.parquet(s"$dir/fp"), spark.read.parquet(s"$dir/bands"))
    DedupIndex.writeBlooms(spark, dir, blooms, upToBatch = 0L)
    val restored = DedupIndex.readBlooms(spark, dir)
    assert(restored.isDefined, "blooms should round-trip from the index dir")
    assert(DedupIndex.readBloomWatermark(spark, dir).contains(0L))
    val viaBloom = DedupIndex.dedupBatchBloom(spark, dir, incoming)
      .select("doc_id", "fp").orderBy("doc_id")
    assertSameTable(viaBloom, viaPlain, "stored-bloom batch vs plain batch")
  }

  test("a STALE bloom stays exact: post-build accepts are confirmed by the plain rung") {
    val s = spark
    import s.implicits._
    val (incoming, existing) = split()
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-stale").toString
    DedupIndex.init(existing, dir)
    DedupIndex.writeBlooms(spark, dir, DedupIndex.buildBlooms(
      spark.read.parquet(s"$dir/fp"), spark.read.parquet(s"$dir/bands")), upToBatch = 0L)
    // batch 1 lands AFTER the bloom build — its keys are invisible to
    // the stored blooms, so a bloom-only prefilter would declare a
    // batch-2 duplicate of a batch-1 doc "provably new" (the false
    // negative the watermark exists to catch)
    val batch1 = Seq((900001L, "a brand new document that the blooms never saw"))
      .toDF("doc_id", "text")
    DedupIndex.accept(DedupIndex.dedupBatch(spark, dir, batch1), dir, batchId = 1L)
    val batch2 = Seq(
      (900002L, "a brand new document that the blooms never saw"), // dup of batch 1
      (900003L, "a genuinely novel second-increment document"))
      .toDF("doc_id", "text")
    val viaBloom = DedupIndex.dedupBatchBloom(spark, dir, batch2)
    assert(viaBloom.select("doc_id").as[Long].collect().toSet == Set(900003L),
      "the stale-bloom path must still drop the post-build duplicate")
    // and it must equal the plain stored-index increment exactly
    assertSameTable(
      viaBloom.select("doc_id", "fp").orderBy("doc_id"),
      DedupIndex.dedupBatch(spark, dir, batch2).select("doc_id", "fp").orderBy("doc_id"),
      "stale-bloom batch vs plain batch")
    // compact rebuilds the blooms (the rebuild rides the fold) and
    // advances the watermark to the folded high-water id — fresh again
    DedupIndex.compact(spark, dir)
    assert(DedupIndex.readBloomWatermark(spark, dir).contains(1L))
    assertSameTable(
      DedupIndex.dedupBatchBloom(spark, dir, batch2).select("doc_id", "fp").orderBy("doc_id"),
      DedupIndex.dedupBatch(spark, dir, batch2).select("doc_id", "fp").orderBy("doc_id"),
      "post-compact bloom batch vs plain batch")
  }
}
