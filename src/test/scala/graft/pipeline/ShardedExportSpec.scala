package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The physical shard sink: one file per shard, deterministic
  * contents, a manifest that matches the landed files, the empty-export
  * refusal, and the swap crash window healing on read.
  */
class ShardedExportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def packed(n: Int) = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => (i.toLong, (i % 5).toLong, s"payload $i"))
      .toDF("doc_id", "shard_id", "text")
  }

  test("one file per shard, manifest matches, rows and order intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString + "/exp"
    val df = packed(103)
    val shards = ShardedExport.export(df, dir, "shard_id", Seq("doc_id"))
    assert(shards === 5L)

    val fs = new java.io.File(dir)
    val shardDirs = fs.listFiles().filter(_.getName.startsWith("shard_id=")).toSeq
    assert(shardDirs.size === 5)
    shardDirs.foreach { d =>
      val dataFiles = d.listFiles().filter(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      assert(dataFiles.length === 1, s"shard dir ${d.getName} must hold exactly one data file")
    }

    // round-trip: all rows, and the plain read never sees the manifest
    val back = ShardedExport.read(spark, dir)
    assert(back.count() === 103L)
    assert(back.columns.sorted === Array("doc_id", "shard_id", "text"))

    // manifest vs an independent groupBy of the source
    val man = ShardedExport.manifest(spark, dir)
      .select(col("shard_id").cast("long"), col("n_rows"), col("min_key"), col("max_key"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expect = df.groupBy("shard_id")
      .agg(count(lit(1)).as("n"), min("doc_id").as("mn"), max("doc_id").as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(man === expect)

    // within-file order: ascending doc_id per shard file
    val s = spark
    import s.implicits._
    shardDirs.foreach { d =>
      val ids = spark.read.parquet(d.getAbsolutePath).select("doc_id").as[Long].collect()
      assert(ids.sameElements(ids.sorted), s"rows in ${d.getName} must be doc_id-sorted")
    }
  }

  test("re-export replaces atomically; empty export refused; torn swap heals") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards2").toString + "/exp"
    ShardedExport.export(packed(20), dir, "shard_id", Seq("doc_id"))
    ShardedExport.export(packed(40), dir, "shard_id", Seq("doc_id"))
    assert(ShardedExport.read(spark, dir).count() === 40L)

    val ex = intercept[IllegalArgumentException] {
      ShardedExport.export(packed(40).filter(col("doc_id") < 0), dir, "shard_id", Seq("doc_id"))
    }
    assert(ex.getMessage.contains("0 rows"))
    assert(ShardedExport.read(spark, dir).count() === 40L, "live export untouched by refusal")

    // manufacture the between-renames crash window: complete swap beside
    // a missing live dir — the next read must promote it
    val fs = new java.io.File(dir)
    val swap = new java.io.File(dir + ".swap")
    assert(fs.renameTo(swap))
    new java.io.File(swap, "_GRAFT_COMMIT").createNewFile()
    val healed = ShardedExport.read(spark, dir)
    assert(healed.count() === 40L)
    assert(new java.io.File(dir).exists() && !swap.exists())
  }
}
