package graft.operators

import graft.Tables
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The trained quantizer wired into the live index lifecycle (VERDICT
  * r5 #4): `retrain(dir)` must equal a from-scratch `init` with a
  * kmeans quantizer over the merged corpus, recall must improve on a
  * drifted corpus (batches assigned against frozen stand-in centroids),
  * and `retrainIfDrifted` must trigger exactly on the threshold.
  */
class AnnRetrainSpec extends AnyFunSuite {
  import TableAssertions.assertSameTable
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.1"

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def queries(e: DataFrame) =
    e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))

  private def meanRecall(dir: String, qs: DataFrame): Double =
    AnnIndex.recallAudit(spark, dir, qs, nprobe = 2)
      .agg(avg(col("recall"))).head().getDouble(0)

  test("retrain(dir) == init with kmeans on the merged corpus; recall improves on drift") {
    val e = Tables.embeddings(spark, d)
    // drift scenario: the index is inited on half the corpus with the
    // 16-vector STAND-IN quantizer, then grows by a batch the frozen
    // centroids never saw
    val base = e.filter(col("vec_id") < 1000)
    val batch = e.filter(col("vec_id") >= 1000)
    val dir = tmp("graft-ann-retrain")
    AnnIndex.init(base, dir)
    AnnIndex.addBatch(spark, batch, dir, batchId = 1L)
    val qs = queries(e)
    val before = meanRecall(dir, qs)

    AnnIndex.retrain(spark, dir)
    val after = meanRecall(dir, qs)
    info(f"recall@3 nprobe=2: stand-in (drifted) $before%.3f -> retrained $after%.3f")
    assert(after > before,
      f"retraining on the drifted corpus must improve recall: $after%.3f !> $before%.3f")

    // retrain == from-scratch init with the same trained quantizer over
    // the merged corpus — same centroids, same inverted file
    val freshDir = tmp("graft-ann-retrain-fresh")
    AnnIndex.init(e, freshDir, quantizer = Some(AnnIndex.kmeans(e)))
    // centroids: equal up to float-summation jitter in the distributed
    // means (same tolerance AnnKMeansSpec pins for re-running kmeans)
    val cj = spark.read.parquet(s"$dir/centroids").select(col("c_id"), col("cv").as("cv_a"))
      .join(spark.read.parquet(s"$freshDir/centroids").select(col("c_id"), col("cv").as("cv_b")),
        Seq("c_id"), "full_outer")
    assert(cj.filter(col("cv_a").isNull || col("cv_b").isNull).count() === 0L)
    val maxDiff = cj
      .select(aggregate(zip_with(col("cv_a"), col("cv_b"),
        (x, y) => abs(x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => greatest(acc, v)).as("md"))
      .agg(max(col("md"))).head().getDouble(0)
    assert(maxDiff < 1e-6, s"retrained centroids drifted from freshly-trained: $maxDiff")
    assertSameTable(
      spark.read.parquet(s"$dir/cells").select("vec_id", "cell", "pq", "sp"),
      spark.read.parquet(s"$freshDir/cells").select("vec_id", "cell", "pq", "sp"),
      "retrained vs freshly-built inverted file")

    // searchInt8 keeps working against the retrained store (codes were
    // rewritten with the cells)
    assert(AnnIndex.searchInt8(spark, dir, qs, nprobe = 2, k = 3).count() === 30L)
  }

  test("retrain's hash-sampled training slice: deterministic, index stays consistent") {
    val e = Tables.embeddings(spark, d)
    val dir = tmp("graft-ann-sampled")
    AnnIndex.init(e, dir)
    // force the sampling path: 2000 stored rows, target 400 -> m = 5
    AnnIndex.retrain(spark, dir, trainSampleTarget = 400L)
    val qs = queries(e)
    assert(AnnIndex.searchInt8(spark, dir, qs, nprobe = 2, k = 3).count() === 30L)
    // deterministic: a second sampled retrain re-derives the same index
    val cellsA = spark.read.parquet(s"$dir/cells").select("vec_id", "cell").localCheckpoint()
    AnnIndex.retrain(spark, dir, trainSampleTarget = 400L)
    assertSameTable(cellsA,
      spark.read.parquet(s"$dir/cells").select("vec_id", "cell"),
      "sampled retrain must be deterministic across runs")
    // and the slice is the documented pmod(xxhash64) filter: training on
    // the manually-sliced corpus from scratch yields the same centroids
    val slice = e.filter(pmod(xxhash64(col("vec_id")), lit(5L)) === 0)
    val freshDir = tmp("graft-ann-sampled-fresh")
    AnnIndex.init(e, freshDir, quantizer = Some(AnnIndex.kmeans(slice)))
    assertSameTable(
      spark.read.parquet(s"$dir/cells").select("vec_id", "cell"),
      spark.read.parquet(s"$freshDir/cells").select("vec_id", "cell"),
      "sampled retrain == init with kmeans on the same hash slice")
  }

  test("retrainIfDrifted triggers on the threshold and not below it") {
    val e = Tables.embeddings(spark, d)
    val dir = tmp("graft-ann-trigger")
    AnnIndex.init(e, dir)
    val qs = queries(e)
    val current = meanRecall(dir, qs)
    assert(!AnnIndex.retrainIfDrifted(spark, dir, qs, nprobe = 2, minRecall = current - 0.01),
      "recall at/above threshold must not retrain")
    assert(AnnIndex.retrainIfDrifted(spark, dir, qs, nprobe = 2, minRecall = current + 0.01),
      "recall below threshold must retrain")
    assert(meanRecall(dir, qs) >= current,
      "the triggered retrain must not make recall worse on a static corpus")

    // ADVICE r6: an empty query sample makes mean recall UNDEFINED —
    // refuse with the cause, don't NPE on the null aggregate
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.retrainIfDrifted(spark, dir, qs.filter(lit(false)), nprobe = 2, minRecall = 0.5)
    }
    assert(ex.getMessage.contains("query sample is empty"))
  }

  test("torn joint retrain replays to ONE training epoch in every crash window") {
    // retrain replaces cells AND centroids; r14 made the pair a joint
    // journaled swap after a crash between the two independent commits
    // could leave NEW-space cells under OLD centroids — silent recall
    // corruption every later addBatch would compound. Manufacture each
    // window with the protocol's own public pieces and assert the heal
    // lands a CONSISTENT epoch (all-old or all-new, never mixed).
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = queries(e)
    def freshIndex(): String = { val dir = tmp("graft-ann-joint"); AnnIndex.init(e, dir); dir }
    val cents2 = AnnIndex.kmeans(e, 16, 2).localCheckpoint() // the new epoch's quantizer
    def stageBoth(dir: String): Unit = {
      graft.BatchSink.stageReplaceTable(
        AnnIndex.withCodes(AnnIndex.assign(e, cents2)), s"$dir/cells", Seq("cell"))
      graft.BatchSink.stageReplaceTable(cents2, s"$dir/centroids")
    }
    def marker(dir: String) = new org.apache.hadoop.fs.Path(s"$dir/_GRAFT_RETRAIN_PENDING")
    def fsOf(dir: String) = marker(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def cellsOf(dir: String) =
      spark.read.parquet(s"$dir/cells").select("vec_id", "cell").orderBy("vec_id")
    def centsOf(dir: String) =
      spark.read.parquet(s"$dir/centroids").select("c_id", "cv").orderBy("c_id")

    // reference new-epoch state: the protocol driven to completion
    val done = freshIndex(); stageBoth(done)
    fsOf(done).create(marker(done), true).close()
    graft.BatchSink.commitSwapDir(spark, s"$done/cells")
    graft.BatchSink.commitSwapDir(spark, s"$done/centroids")
    fsOf(done).delete(marker(done), false)

    // window A — crash BEFORE the marker: both stagings present but
    // unjournaled; the heal sweeps them and the OLD epoch keeps serving
    val a = freshIndex()
    val oldCells = cellsOf(a).localCheckpoint()
    stageBoth(a)
    AnnIndex.search(spark, a, qs, nprobe = 2, k = 3).collect() // readHealed heals
    assertSameTable(cellsOf(a), oldCells, "window A: old epoch must keep serving")
    assert(!fsOf(a).exists(new org.apache.hadoop.fs.Path(s"$a/cells.swap")),
      "window A: unjournaled staging must be swept")

    // window B — crash AFTER the marker, before any commit: the replay
    // promotes BOTH stagings to the new epoch
    val b = freshIndex(); stageBoth(b)
    fsOf(b).create(marker(b), true).close()
    AnnIndex.search(spark, b, qs, nprobe = 2, k = 3).collect()
    assert(!fsOf(b).exists(marker(b)), "window B: marker must clear after replay")
    assertSameTable(cellsOf(b), cellsOf(done), "window B: cells must be the new epoch")
    assertSameTable(centsOf(b), centsOf(done), "window B: centroids must be the new epoch")

    // window C — THE corruption window the journal exists for: cells
    // committed, centroids still staged; the replay finishes promoting
    // so cells and centroids come from the same training epoch
    val c = freshIndex(); stageBoth(c)
    fsOf(c).create(marker(c), true).close()
    graft.BatchSink.commitSwapDir(spark, s"$c/cells")
    AnnIndex.search(spark, c, qs, nprobe = 2, k = 3).collect()
    assert(!fsOf(c).exists(marker(c)), "window C: marker must clear after replay")
    assertSameTable(cellsOf(c), cellsOf(done), "window C: cells must be the new epoch")
    assertSameTable(centsOf(c), centsOf(done), "window C: centroids must be the new epoch")
  }
}
