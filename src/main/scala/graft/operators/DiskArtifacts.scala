package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** On-disk persistence for the TRAINED/DERIVED artifacts whose cold
  * builds dominate the bench tail (VERDICT r15 ask #1: "persist the
  * artifact across the bench run") — the disk twin of
  * [[SessionArtifacts]]' session-scoped caches. The shingle base, pair
  * scores, k-means centroids, bloom sketches and PQ codebooks are pure
  * functions of an immutable corpus; production systems build them
  * once and serve every later session from storage (this engine's own
  * `DedupIndex` / `AnnIndex` / `AnnPqStore` stores are the
  * caller-managed form). This object is the AUTOMATIC form for the
  * query-surface builders: keyed by a corpus CONTENT fingerprint so a
  * changed corpus rebuilds, committed atomically so a torn write is
  * never read, and falling back to the in-memory build on any
  * filesystem contention — persistence is an optimization, never a
  * correctness dependency.
  *
  * Layout: `<tmpdir>/graft-artifacts-<corpus>/<name>/` holding one
  * parquet dir per part plus a `_KEY` file (the corpus fingerprint,
  * the LAST thing staged before the atomic rename — its presence
  * certifies the parts are complete). Staleness: `_KEY` mismatch ⇒
  * rebuild. Concurrency: writers stage under `<name>.tmp-<appId>` and
  * rename over; concurrent first-populations both build (each returns
  * its own in-memory result) and the last rename wins with identical
  * content — readers only ever see a committed dir.
  */
private[graft] object DiskArtifacts {

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Content fingerprint of a corpus dir: (name, length, mtime) of
    * every parquet file. The testdata corpora are immutable, so this is
    * conservative — any regeneration (new mtime) invalidates.
    */
  def corpusKey(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(spark, p)
    val key = fs.listStatus(p).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .mkString(";")
    // an empty fingerprint would match FOREVER (a corpus dir with no
    // root parquet yet — e.g. tables still landing — must never pin an
    // artifact to "nothing there"); refuse loudly, the caller's corpus
    // layout is wrong for content-keyed persistence
    require(key.nonEmpty,
      s"DiskArtifacts.corpusKey: no *.parquet files at $dir — not a corpus root")
    key
  }

  private def root(corpusDir: String, name: String): String =
    System.getProperty("java.io.tmpdir") + "/graft-artifacts-" +
      corpusDir.replaceAll("[^A-Za-z0-9]", "_") + "/" + name

  /** Reap staging dirs (`<name>.tmp-<appId>`) left by writers that died
    * mid-persist — without this a crashed JVM leaks a full artifact
    * copy per crash, forever. Only FOREIGN, hour-stale staging is
    * touched: a live writer's staging is seconds old (it stages and
    * renames within one build), so the age cutoff can never race an
    * in-flight persist, and this writer's own staging is deleted
    * explicitly on its next attempt anyway.
    */
  private def gcDeadStaging(fs: org.apache.hadoop.fs.FileSystem,
                            dir: org.apache.hadoop.fs.Path): Unit =
    try {
      val parent = dir.getParent
      if (fs.exists(parent)) {
        val cutoff = System.currentTimeMillis() - 3600L * 1000L
        fs.listStatus(parent).foreach { st =>
          if (st.getPath.getName.startsWith(dir.getName + ".tmp-") &&
              st.getModificationTime < cutoff)
            fs.delete(st.getPath, true)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Load the named multi-part artifact if a committed copy matches the
    * corpus fingerprint; otherwise run `build`, persist its parts, and
    * return the in-memory relations (callers keep their checkpointed
    * plans on the cold path — no read-back penalty). The Boolean is
    * true on a disk hit (callers log/characterize cold vs warm).
    */
  def loadOrBuildMany(spark: SparkSession, corpusDir: String, name: String,
                      parts: Seq[String])(build: => Map[String, DataFrame])
      : (Map[String, DataFrame], Boolean) = {
    // a non-corpus dir (corpusKey refuses an empty fingerprint) routes
    // to a plain uncached build — persistence is an optimization here,
    // never a prerequisite
    val keyOpt =
      try Some(corpusKey(spark, corpusDir))
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[DiskArtifacts] $name uncached: ${e.getMessage}")
          None
      }
    if (keyOpt.isEmpty) {
      val built = build
      require(parts.toSet == built.keySet,
        s"DiskArtifacts($name): build returned ${built.keySet}, expected $parts")
      return (built, false)
    }
    val key = keyOpt.get
    val dir = root(corpusDir, name)
    val keyPath = new org.apache.hadoop.fs.Path(s"$dir/_KEY")
    val fs = fsOf(spark, keyPath)
    val hit =
      try {
        fs.exists(keyPath) && {
          val in = fs.open(keyPath)
          val stored = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          stored == key &&
            parts.forall(p => fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$p")))
        }
      } catch { case scala.util.control.NonFatal(_) => false }
    if (hit) {
      (parts.map(p => p -> spark.read.parquet(s"$dir/$p")).toMap, true)
    } else {
      val built = build
      require(parts.toSet == built.keySet,
        s"DiskArtifacts($name): build returned ${built.keySet}, expected $parts")
      try {
        gcDeadStaging(fs, new org.apache.hadoop.fs.Path(dir))
        val staging = dir + ".tmp-" + spark.sparkContext.applicationId
        val stagingPath = new org.apache.hadoop.fs.Path(staging)
        fs.delete(stagingPath, true)
        parts.foreach(p => built(p).write.mode("overwrite").parquet(s"$staging/$p"))
        val out = fs.create(new org.apache.hadoop.fs.Path(s"$staging/_KEY"), true)
        out.write(key.getBytes("UTF-8")); out.close()
        fs.mkdirs(new org.apache.hadoop.fs.Path(dir).getParent)
        fs.delete(new org.apache.hadoop.fs.Path(dir), true)
        if (!fs.rename(stagingPath, new org.apache.hadoop.fs.Path(dir)))
          fs.delete(stagingPath, true) // lost a populate race — other copy is equivalent
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[DiskArtifacts] persist of $name skipped: ${e.getMessage}")
      }
      (built, false)
    }
  }

  /** Single-relation convenience form. */
  def loadOrBuild(spark: SparkSession, corpusDir: String, name: String)
                 (build: => DataFrame): (DataFrame, Boolean) = {
    val (m, hit) = loadOrBuildMany(spark, corpusDir, name, Seq("data"))(
      Map("data" -> build))
    (m("data"), hit)
  }

  /** Byte-blob form for DRIVER-SIDE artifacts (serialized bloom/sketch
    * objects): written straight through the filesystem — shipping a
    * megabyte blob through a one-row DataFrame would serialize it into
    * a task binary (Spark's large-task WARN) for no benefit. Same key +
    * staging + atomic-rename contract as the relation form.
    */
  def loadOrBuildBlobs(spark: SparkSession, corpusDir: String, name: String,
                       parts: Seq[String])(build: => Map[String, Array[Byte]])
      : (Map[String, Array[Byte]], Boolean) = {
    val keyOpt =
      try Some(corpusKey(spark, corpusDir))
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[DiskArtifacts] $name uncached: ${e.getMessage}")
          None
      }
    if (keyOpt.isEmpty) {
      val built = build
      require(parts.toSet == built.keySet,
        s"DiskArtifacts($name): build returned ${built.keySet}, expected $parts")
      return (built, false)
    }
    val key = keyOpt.get
    val dir = root(corpusDir, name)
    val keyPath = new org.apache.hadoop.fs.Path(s"$dir/_KEY")
    val fs = fsOf(spark, keyPath)
    def readBytes(p: org.apache.hadoop.fs.Path): Array[Byte] = {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
        out.toByteArray
      } finally in.close()
    }
    val loaded: Option[Map[String, Array[Byte]]] =
      try {
        if (fs.exists(keyPath) &&
            new String(readBytes(keyPath), "UTF-8") == key &&
            parts.forall(p => fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$p.bin"))))
          Some(parts.map(p =>
            p -> readBytes(new org.apache.hadoop.fs.Path(s"$dir/$p.bin"))).toMap)
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
    loaded match {
      case Some(m) => (m, true)
      case None =>
        val built = build
        require(parts.toSet == built.keySet,
          s"DiskArtifacts($name): build returned ${built.keySet}, expected $parts")
        try {
          gcDeadStaging(fs, new org.apache.hadoop.fs.Path(dir))
          val staging = dir + ".tmp-" + spark.sparkContext.applicationId
          val stagingPath = new org.apache.hadoop.fs.Path(staging)
          fs.delete(stagingPath, true)
          parts.foreach { p =>
            val out = fs.create(new org.apache.hadoop.fs.Path(s"$staging/$p.bin"), true)
            out.write(built(p)); out.close()
          }
          val out = fs.create(new org.apache.hadoop.fs.Path(s"$staging/_KEY"), true)
          out.write(key.getBytes("UTF-8")); out.close()
          fs.mkdirs(new org.apache.hadoop.fs.Path(dir).getParent)
          fs.delete(new org.apache.hadoop.fs.Path(dir), true)
          if (!fs.rename(stagingPath, new org.apache.hadoop.fs.Path(dir)))
            fs.delete(stagingPath, true)
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[DiskArtifacts] persist of $name skipped: ${e.getMessage}")
        }
        (built, false)
    }
  }
}
