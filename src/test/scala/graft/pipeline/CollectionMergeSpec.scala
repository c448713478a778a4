package graft.pipeline

import graft.Tables
import graft.operators.TableAssertions.assertSameTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stored CDC collection merge (VERDICT r12 ask #5): apply-then-read
  * == direct-new-snapshot, under the full lifecycle — init, merge,
  * idempotent re-merge, and both crash windows of the write-then-swap
  * (before commit: old collection intact and the merge re-runnable;
  * after commit, before rename: the read path promotes the swap).
  */
class CollectionMergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def snapshots = {
    val docs = Tables.documents(spark, d)
    val old = docs.filter(col("doc_id") % 5 =!= 1)
      .withColumn("text", when(col("doc_id") % 5 === 3,
        substring(col("text"), 1, 100)).otherwise(col("text")))
    val nw = docs.filter(col("doc_id") % 5 =!= 2)
    (old, nw)
  }

  test("merge(init(old), diff, new) reads back as pointsOf(new); re-merge is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft-coll").toString + "/points"
    val (old, nw) = snapshots
    CollectionStore.init(old, dir)
    // sanity: the initial store IS the old snapshot's points
    assertSameTable(CollectionStore.read(spark, dir).orderBy("doc_id", "chunk_index"),
      CollectionStore.pointsOf(old).orderBy("doc_id", "chunk_index"),
      "initial collection vs old snapshot points")

    val diff = CollectionStore.docDiff(old, nw)
    CollectionStore.merge(spark, dir, diff, nw)
    def direct = CollectionStore.pointsOf(nw).orderBy("doc_id", "chunk_index")
    assertSameTable(CollectionStore.read(spark, dir).orderBy("doc_id", "chunk_index"),
      direct, "merged collection vs direct new-snapshot points")

    // re-running the same merge derives the same table (idempotent by
    // value — the replay story after a crash BEFORE the swap committed)
    CollectionStore.merge(spark, dir, CollectionStore.docDiff(nw, nw).limit(0), nw)
    assertSameTable(CollectionStore.read(spark, dir).orderBy("doc_id", "chunk_index"),
      direct, "re-merge with an empty diff is a no-op")
  }

  test("crash between the swap's renames: read promotes the committed merge") {
    val dir = java.nio.file.Files.createTempDirectory("graft-coll2").toString + "/points"
    val (old, nw) = snapshots
    CollectionStore.init(old, dir)
    // stage the merged table as a COMMITTED swap (sentinel present) and
    // delete the live table — the window between replaceTable's renames
    val merged = CollectionStore.applyDocDiff(CollectionStore.read(spark, dir),
      CollectionStore.docDiff(old, nw), nw)
    merged.withColumn("batch_id", lit(0L))
      .write.partitionBy("batch_id").parquet(s"$dir.swap")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$dir.swap/_GRAFT_COMMIT"), true).close()
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    assertSameTable(CollectionStore.read(spark, dir).orderBy("doc_id", "chunk_index"),
      CollectionStore.pointsOf(nw).orderBy("doc_id", "chunk_index"),
      "healed read vs direct new-snapshot points")
  }

  test("an UNCOMMITTED swap is never promoted: old collection still serves") {
    val dir = java.nio.file.Files.createTempDirectory("graft-coll3").toString + "/points"
    val (old, nw) = snapshots
    CollectionStore.init(old, dir)
    // partial swap, no sentinel — a crash mid-write; read must keep the
    // live (old) table and a re-run of merge must converge
    CollectionStore.pointsOf(nw).limit(3).withColumn("batch_id", lit(0L))
      .write.partitionBy("batch_id").parquet(s"$dir.swap")
    assertSameTable(CollectionStore.read(spark, dir).orderBy("doc_id", "chunk_index"),
      CollectionStore.pointsOf(old).orderBy("doc_id", "chunk_index"),
      "uncommitted swap ignored, old collection intact")
    CollectionStore.merge(spark, dir, CollectionStore.docDiff(old, nw), nw)
    assertSameTable(CollectionStore.read(spark, dir).orderBy("doc_id", "chunk_index"),
      CollectionStore.pointsOf(nw).orderBy("doc_id", "chunk_index"),
      "re-run merge converges after the crash")
  }
}
