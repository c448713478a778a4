package graft.operators

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the disk artifact store's contract (r16): fingerprint-keyed
  * load-or-build, atomic commit (a torn/corrupted dir falls back to a
  * build, never an error), staleness on corpus change, and the blob
  * form's byte-exact round trip.
  */
class DiskArtifactsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshCorpus(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-da-$tag").toString
    val s = spark
    import s.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "t")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/staging")
    // place a single parquet FILE at the corpus root like the testdata
    // layout (corpusKey fingerprints root-level *.parquet files)
    val part = new java.io.File(s"$dir/staging").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    dir
  }

  test("second load is a hit with identical rows; changed corpus rebuilds") {
    val corpus = freshCorpus("hit")
    var builds = 0
    def load() = DiskArtifacts.loadOrBuild(spark, corpus, "t_rel") {
      builds += 1
      spark.read.parquet(s"$corpus/documents.parquet")
        .select(col("id"), upper(col("t")).as("t"))
        .localCheckpoint()
    }
    val (first, hit1) = load()
    assert(!hit1 && builds == 1)
    val firstRows = first.orderBy("id").collect().map(_.toSeq).toSeq
    val (second, hit2) = load()
    assert(hit2 && builds == 1, "second load should hit disk, not rebuild")
    assert(second.orderBy("id").collect().map(_.toSeq).toSeq == firstRows)
    // regenerate the corpus file (new mtime) => fingerprint mismatch => rebuild
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(s"$corpus/documents.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 5000))
    val (_, hit3) = load()
    assert(!hit3 && builds == 2, "stale fingerprint must rebuild")
  }

  test("a corrupted committed dir falls back to a build (never an error)") {
    val corpus = freshCorpus("corrupt")
    val (_, h0) = DiskArtifacts.loadOrBuild(spark, corpus, "t_rel") {
      spark.range(3).toDF("id").localCheckpoint()
    }
    assert(!h0)
    // wreck the committed copy: delete the data part but keep _KEY
    val root = new java.io.File(System.getProperty("java.io.tmpdir") +
      "/graft-artifacts-" + corpus.replaceAll("[^A-Za-z0-9]", "_") + "/t_rel/data")
    assert(root.exists, s"expected committed data at $root")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(root)
    var rebuilt = false
    val (df, h1) = DiskArtifacts.loadOrBuild(spark, corpus, "t_rel") {
      rebuilt = true
      spark.range(3).toDF("id").localCheckpoint()
    }
    assert(!h1 && rebuilt, "missing part must route to the build")
    assert(df.count() == 3L)
  }

  test("blob form round-trips bytes exactly and hits on second load") {
    val corpus = freshCorpus("blob")
    val payload = Array.tabulate[Byte](4096)(i => (i * 31 % 251).toByte)
    val (m1, h1) = DiskArtifacts.loadOrBuildBlobs(spark, corpus, "t_blob",
      Seq("x"))(Map("x" -> payload))
    assert(!h1 && java.util.Arrays.equals(m1("x"), payload))
    val (m2, h2) = DiskArtifacts.loadOrBuildBlobs(spark, corpus, "t_blob",
      Seq("x"))(Map("x" -> Array[Byte](9)))
    assert(h2, "second blob load should hit")
    assert(java.util.Arrays.equals(m2("x"), payload),
      "hit must return the PERSISTED bytes, not re-run the build")
  }
}
