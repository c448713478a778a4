package graft.operators

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the disk artifact store's contract (r16, generation layout
  * r17): fingerprint-keyed load-or-build, atomic commit (a torn or
  * corrupted generation falls back to a build, never an error),
  * staleness on corpus change, the blob form's byte-exact round trip —
  * and the generation-dir guarantees the r16 review asked for: a
  * committed generation's files are never replaced or deleted while
  * fresh (so concurrent sessions' lazily-read frames stay valid), a
  * corrupt generation stays safely cold until hour-stale and only then
  * is repaired.
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

  private def committedGen(corpus: String, name: String): java.io.File =
    new java.io.File(DiskArtifacts.genDir(corpus, name,
      DiskArtifacts.corpusKey(spark, corpus)))

  private def listing(dir: java.io.File): Seq[(String, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    walk(dir).map(f => (f.getPath, f.lastModified())).sortBy(_._1)
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
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

  test("a corrupted committed generation falls back to a build (never an error)") {
    val corpus = freshCorpus("corrupt")
    val (_, h0) = DiskArtifacts.loadOrBuild(spark, corpus, "t_rel") {
      spark.range(3).toDF("id").localCheckpoint()
    }
    assert(!h0)
    // wreck the committed copy: delete the data part but keep _KEY
    val gen = committedGen(corpus, "t_rel")
    val data = new java.io.File(gen, "data")
    assert(data.exists, s"expected committed data at $data")
    rm(data)
    var rebuilt = false
    val (df, h1) = DiskArtifacts.loadOrBuild(spark, corpus, "t_rel") {
      rebuilt = true
      spark.range(3).toDF("id").localCheckpoint()
    }
    assert(!h1 && rebuilt, "missing part must route to the build")
    assert(df.count() == 3L)
  }

  test("a fresh committed generation's files are never deleted or replaced " +
    "by later populates; a corrupt one is repaired only once hour-stale") {
    val corpus = freshCorpus("gen")
    def load() = DiskArtifacts.loadOrBuild(spark, corpus, "t_rel") {
      spark.range(4).toDF("id").localCheckpoint()
    }
    load()
    val gen = committedGen(corpus, "t_rel")
    val committed = listing(gen)
    assert(committed.nonEmpty)
    // a warm load re-touches the generation dir but never its files —
    // the exact files a concurrent session's lazily-evaluated frames
    // point at stay in place byte for byte (the r16 delete-then-rename
    // hazard, now structurally absent)
    val (_, hWarm) = load()
    assert(hWarm)
    assert(listing(gen) == committed, "a hit must not touch committed files")
    // corrupt the generation (_KEY removed): while the dir is UNDER an
    // hour old a populate must neither error nor delete it — the
    // session just stays cold on its in-memory build
    assert(new java.io.File(gen, "_KEY").delete())
    val afterCorrupt = listing(gen)
    val (df1, h1) = load()
    assert(!h1 && df1.count() == 4L)
    assert(listing(gen) == afterCorrupt,
      "an under-an-hour-old generation is never repaired in place")
    // age the dir past the hour: the next populate repairs it (delete +
    // fresh commit) and the one after hits again. The sentinel file
    // proves the repair DELETED the corrupt dir and recommitted a fresh
    // staging rather than patching in place (VERDICT r17 ask #4)
    assert(new java.io.File(gen, "_SENTINEL").createNewFile())
    assert(gen.setLastModified(System.currentTimeMillis() - 2L * 3600L * 1000L))
    val (_, h2) = load()
    assert(!h2, "the repairing populate itself is a cold build")
    assert(new java.io.File(gen, "_KEY").exists, "repair must recommit _KEY")
    assert(!new java.io.File(gen, "_SENTINEL").exists,
      "repair must delete the corrupt generation, not patch it in place")
    val (_, h3) = load()
    assert(h3, "post-repair load must hit")
  }

  test("hour-stale OLD-LAYOUT roots are reaped; new-layout roots survive") {
    // ADVICE r17: pre-generation-layout roots (no -<pathmd5> suffix)
    // were orphaned by the rename — nothing scanned them, so they
    // leaked forever. The one-time sweep reaps hour-stale old-layout
    // dirs and leaves suffixed (new-layout) ones alone. The sweep
    // latch is per-JVM and an earlier test's load may already have
    // tripped it, so re-arm it before staging the fixture dirs.
    val base = System.getProperty("java.io.tmpdir")
    val old = new java.io.File(base, "graft-artifacts-_spec_old_layout")
    val nw = new java.io.File(base, "graft-artifacts-_spec_new_layout-0123abcd")
    try {
      assert(old.mkdirs() && new java.io.File(old, "x").createNewFile())
      assert(nw.mkdirs())
      assert(old.setLastModified(System.currentTimeMillis() - 2L * 3600L * 1000L))
      assert(nw.setLastModified(System.currentTimeMillis() - 2L * 3600L * 1000L))
      DiskArtifacts.resetOldLayoutReapForSpec()
      val corpus = freshCorpus("reap")
      DiskArtifacts.loadOrBuild(spark, corpus, "t_rel") {
        spark.range(2).toDF("id").localCheckpoint()
      }
      assert(!old.exists, "hour-stale old-layout root must be reaped")
      assert(nw.exists, "new-layout roots are NEVER touched by the old-layout sweep")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      Seq(old, nw).foreach(rm)
    }
  }

  test("distinct corpus paths with identical sanitized names do not share a root") {
    // ADVICE r16: /x/sf0.1 and /x/sf0_1 sanitize identically; the md5
    // suffix must keep their artifact roots (and so their generations)
    // apart
    val a = DiskArtifacts.genDir("/x/sf0.1", "t", "k")
    val b = DiskArtifacts.genDir("/x/sf0_1", "t", "k")
    assert(a != b)
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
