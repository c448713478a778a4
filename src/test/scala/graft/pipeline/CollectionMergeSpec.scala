package graft.pipeline

import graft.Tables
import graft.operators.TableAssertions.assertSameTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stored CDC collection merge (VERDICT r12 ask #5; r14 partition-
  * scoped): apply-then-read == direct-new-snapshot, under the full
  * lifecycle — init, merge, idempotent re-merge, crash windows of the
  * init swap AND of the journaled range-swap merge — plus the r14
  * SCALE assertion: a merge rewrites ONLY the range partitions holding
  * affected docs (untouched partitions' files are byte-identical,
  * checked at the FS level by name + length + mtime).
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

  private def fs =
    new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (path, length, mtime) of every data file under a dir — the
    * "did the merge touch this partition" fingerprint.
    */
  private def fileStamps(dir: String): Map[String, (Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) return Map.empty
    val it = fs.listFiles(p, true)
    val m = scala.collection.mutable.Map.empty[String, (Long, Long)]
    while (it.hasNext) {
      val f = it.next()
      m += (f.getPath.toString -> ((f.getLen, f.getModificationTime)))
    }
    m.toMap
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
    // value — the replay story after a crash BEFORE the journal landed);
    // an empty diff is a pure no-op
    CollectionStore.merge(spark, dir, CollectionStore.docDiff(nw, nw).limit(0), nw)
    assertSameTable(CollectionStore.read(spark, dir).orderBy("doc_id", "chunk_index"),
      direct, "re-merge with an empty diff is a no-op")
    // and a full replay of the SAME diff converges (drop-then-rederive)
    CollectionStore.merge(spark, dir, diff, nw)
    assertSameTable(CollectionStore.read(spark, dir).orderBy("doc_id", "chunk_index"),
      direct, "replaying the same merge converges")
  }

  test("merge rewrites ONLY the partitions holding affected docs (FS-level)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-collp").toString + "/points"
    val docs = Tables.documents(spark, d)
    // shrink the range so sf0.001's 50 docs span several partitions
    // deterministically: ids 0..49 / RangeSize=1000 would be ONE range,
    // which cannot distinguish partition-scoped from full rewrite — so
    // spread ids across ranges by scaling them instead
    val spread = docs.withColumn("doc_id", col("doc_id") * lit(CollectionStore.RangeSize / 10))
    val old = spread
    // change exactly one doc: the points of range of doc_id = 0
    val nw = spread.withColumn("text",
      when(col("doc_id") === 0, substring(col("text"), 1, 50)).otherwise(col("text")))
    CollectionStore.init(old, dir)
    val before = fileStamps(dir)
    CollectionStore.merge(spark, dir, CollectionStore.docDiff(old, nw), nw)
    val after = fileStamps(dir)
    assertSameTable(CollectionStore.read(spark, dir).orderBy("doc_id", "chunk_index"),
      CollectionStore.pointsOf(nw).orderBy("doc_id", "chunk_index"),
      "spread-range merged collection vs direct points")
    // every file of every UNAFFECTED range partition is untouched:
    // same path, same length, same modification time
    val affectedDir = "doc_range=0"
    val untouchedBefore = before.filter(!_._1.contains(affectedDir))
    val untouchedAfter = after.filter(!_._1.contains(affectedDir))
    assert(untouchedBefore == untouchedAfter,
      s"unaffected partitions changed:\n${(untouchedBefore.toSet diff untouchedAfter.toSet).take(5)}")
    // and the affected range WAS rewritten
    assert(before.keys.exists(_.contains(affectedDir)) &&
      after.keys.exists(_.contains(affectedDir)) &&
      before.filter(_._1.contains(affectedDir)) != after.filter(_._1.contains(affectedDir)),
      "affected partition was not rewritten")
  }

  test("merge creates a NEW range partition for added docs and DELETES an emptied one") {
    val dir = java.nio.file.Files.createTempDirectory("graft-collr").toString + "/points"
    val docs = Tables.documents(spark, d)
    val spread = docs.withColumn("doc_id", col("doc_id") * lit(CollectionStore.RangeSize / 10))
    // old: ranges 0..49 (ids 0..49900 step 100); new: range 0 fully
    // removed (ids < 1000 dropped), range 60 added (one doc moved past
    // every existing range)
    val old = spread
    val nw = spread.filter(col("doc_id") >= CollectionStore.RangeSize)
      .unionByName(spread.filter(col("doc_id") === 0)
        .withColumn("doc_id", col("doc_id") + lit(60 * CollectionStore.RangeSize)))
    CollectionStore.init(old, dir)
    assert(!fs.exists(liveRange(dir, 60)))
    CollectionStore.merge(spark, dir, CollectionStore.docDiff(old, nw), nw)
    assertSameTable(CollectionStore.read(spark, dir).orderBy("doc_id", "chunk_index"),
      CollectionStore.pointsOf(nw).orderBy("doc_id", "chunk_index"),
      "range add/empty merged collection vs direct points")
    assert(fs.exists(liveRange(dir, 60)), "added docs' new range partition exists")
    assert(!fs.exists(liveRange(dir, 0)), "fully-emptied range partition deleted")
  }

  private def liveRange(dir: String, r: Long) =
    new org.apache.hadoop.fs.Path(s"$dir/batch_id=0/doc_range=$r")

  test("a merge that would empty the collection is refused; live table intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-colle").toString + "/points"
    val (old, _) = snapshots
    CollectionStore.init(old, dir)
    val empty = old.limit(0)
    val ex = intercept[IllegalArgumentException] {
      CollectionStore.merge(spark, dir, CollectionStore.docDiff(old, empty), empty)
    }
    assert(ex.getMessage.contains("EMPTY"))
    assertSameTable(CollectionStore.read(spark, dir).orderBy("doc_id", "chunk_index"),
      CollectionStore.pointsOf(old).orderBy("doc_id", "chunk_index"),
      "refused merge left the collection intact")
  }

  test("crash between the init swap's renames: read promotes the committed swap") {
    val dir = java.nio.file.Files.createTempDirectory("graft-coll2").toString + "/points"
    val (old, nw) = snapshots
    CollectionStore.init(old, dir)
    // stage the merged table as a COMMITTED swap (sentinel present) and
    // delete the live table — the window between replaceTable's renames
    val merged = CollectionStore.applyDocDiff(CollectionStore.read(spark, dir),
      CollectionStore.docDiff(old, nw), nw)
    merged.withColumn("batch_id", lit(0L))
      .withColumn("doc_range", floor(col("doc_id") / CollectionStore.RangeSize).cast("long"))
      .write.partitionBy("batch_id", "doc_range").parquet(s"$dir.swap")
    fs.create(new org.apache.hadoop.fs.Path(s"$dir.swap/_GRAFT_COMMIT"), true).close()
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    assertSameTable(CollectionStore.read(spark, dir).orderBy("doc_id", "chunk_index"),
      CollectionStore.pointsOf(nw).orderBy("doc_id", "chunk_index"),
      "healed read vs direct new-snapshot points")
  }

  test("an UNCOMMITTED merge staging is never promoted: old collection still serves") {
    val dir = java.nio.file.Files.createTempDirectory("graft-coll3").toString + "/points"
    val (old, nw) = snapshots
    CollectionStore.init(old, dir)
    // partial merge staging, no sentinel — a crash mid-write; read must
    // keep the live (old) table and a re-run of merge must converge
    CollectionStore.pointsOf(nw).limit(3)
      .withColumn("doc_range", floor(col("doc_id") / CollectionStore.RangeSize).cast("long"))
      .write.partitionBy("doc_range").parquet(s"$dir.mergeswap")
    assertSameTable(CollectionStore.read(spark, dir).orderBy("doc_id", "chunk_index"),
      CollectionStore.pointsOf(old).orderBy("doc_id", "chunk_index"),
      "uncommitted merge staging ignored, old collection intact")
    CollectionStore.merge(spark, dir, CollectionStore.docDiff(old, nw), nw)
    assertSameTable(CollectionStore.read(spark, dir).orderBy("doc_id", "chunk_index"),
      CollectionStore.pointsOf(nw).orderBy("doc_id", "chunk_index"),
      "re-run merge converges after the crash")
  }

  test("crash DURING range promotion: the journaled merge replays to completion") {
    val dir = java.nio.file.Files.createTempDirectory("graft-coll4").toString + "/points"
    val docs = Tables.documents(spark, d)
    val spread = docs.withColumn("doc_id", col("doc_id") * lit(CollectionStore.RangeSize / 10))
    val old = spread.filter(col("doc_id") =!= 0)
    val nw = spread.withColumn("text",
      when(col("doc_id") === lit(CollectionStore.RangeSize / 10) * 30,
        substring(col("text"), 1, 40)).otherwise(col("text")))
    CollectionStore.init(old, dir)
    // stage the journaled merge by hand — the SAME replacement relation
    // merge derives (all rows of affected ranges, post-diff): data +
    // manifest + sentinel, then "crash" before any promotion — read
    // must replay it fully
    val diff = CollectionStore.docDiff(old, nw)
    val diffDocs = diff.select(col("doc_id"))
    val affected = diffDocs
      .select(floor(col("doc_id") / CollectionStore.RangeSize).cast("long").as("r"))
      .distinct().collect().map(_.getLong(0)).sorted
    val rebuilt = diff.filter(col("status").isin("added", "changed")).select(col("doc_id"))
    val base = spark.read.parquet(dir)
      .filter(col("doc_range").isin(affected: _*))
      .select("doc_id", "chunk_index", "point_id", "character_count")
    val replacement = base.join(diffDocs, Seq("doc_id"), "left_anti")
      .unionByName(CollectionStore.pointsOf(nw.join(rebuilt, Seq("doc_id"), "left_semi")))
      .withColumn("doc_range", floor(col("doc_id") / CollectionStore.RangeSize).cast("long"))
    replacement.write.partitionBy("doc_range").parquet(s"$dir.mergeswap")
    val ranges = affected
    val manifest = ranges.map(r => s"$r:1").mkString("\n")
    val mf = fs.create(new org.apache.hadoop.fs.Path(s"$dir.mergeswap/_GRAFT_MERGE_RANGES"), true)
    mf.write(manifest.getBytes("UTF-8")); mf.close()
    fs.create(new org.apache.hadoop.fs.Path(s"$dir.mergeswap/_GRAFT_COMMIT"), true).close()
    assertSameTable(CollectionStore.read(spark, dir).orderBy("doc_id", "chunk_index"),
      CollectionStore.pointsOf(nw).orderBy("doc_id", "chunk_index"),
      "replayed journaled merge vs direct new-snapshot points")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir.mergeswap")),
      "merge staging swept after replay")
  }
}
