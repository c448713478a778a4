package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the salted-tmp-dir hygiene contract (ADVICE r16: the
  * relay/hotkey dirs leaked one artifact set per JVM forever): a call
  * creates and re-touches this session's dir, reaps HOUR-STALE foreign
  * siblings of the same family, and leaves fresh foreign siblings
  * (a live concurrent JVM) strictly alone.
  */
class TmpDirsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("salted creates own dir, reaps hour-stale foreign siblings, keeps fresh ones") {
    val corpus = "/corp/" + java.util.UUID.randomUUID().toString.take(8)
    val base = System.getProperty("java.io.tmpdir")
    val prefix = "graft-tdspec-" + corpus.replaceAll("[^A-Za-z0-9]", "_") + "-"
    val stale = new java.io.File(base, prefix + "dead-app-1")
    val fresh = new java.io.File(base, prefix + "live-app-2")
    try {
      assert(stale.mkdirs() && new java.io.File(stale, "x").createNewFile())
      assert(fresh.mkdirs())
      assert(stale.setLastModified(System.currentTimeMillis() - 2L * 3600L * 1000L))
      val own = new java.io.File(TmpDirs.salted(spark, "tdspec", corpus))
      assert(own.isDirectory, "own dir must exist after salted()")
      assert(own.getName.startsWith(prefix), "own dir salted under the family prefix")
      assert(!stale.exists, "hour-stale foreign sibling must be reaped")
      assert(fresh.exists, "a FRESH foreign sibling (live JVM) must survive")
      // second call is idempotent and re-touches rather than recreating
      val t0 = own.lastModified()
      Thread.sleep(5)
      assert(TmpDirs.salted(spark, "tdspec", corpus) == own.getPath)
      assert(own.lastModified() >= t0)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      Seq(stale, fresh).foreach(rm)
    }
  }

  test("stageLandingFile is re-entrant: a second stage into the same dest " +
    "replaces the file (never silently keeps the stale one) and re-pins mtime") {
    // VERDICT r17 ask #5: fs.rename onto an existing dest returns false
    // on the local filesystem; before the require()+replace, a caller
    // whose marker write crashed after staging would re-enter and
    // silently keep the FIRST file.
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stage-spec").toString
    try {
      val dest = s"$dir/in/landing.parquet"
      TmpDirs.stageLandingFile(spark, Seq((1L, "old")).toDF("id", "v"), dest, 1000000L)
      assert(new java.io.File(dest).lastModified() == 1000000L)
      TmpDirs.stageLandingFile(spark, Seq((2L, "new"), (3L, "new")).toDF("id", "v"),
        dest, 2000000L)
      val f = new java.io.File(dest)
      assert(f.lastModified() == 2000000L, "re-stage must re-pin the mtime")
      val rows = spark.read.parquet(dest).orderBy("id").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 3L),
        "re-stage must land the SECOND dataframe, not keep the stale file")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }
}
