package graft.operators

import graft.Tables
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted LSH index (VERDICT r5 #3): the stored form must be
  * indistinguishable from the inline oracled queries, keep its bucket
  * stats in lockstep with its vectors, refine plane counts in place by
  * the nesting property, prune its scan to the probed buckets, and
  * guard bucket sizes from the STORED stats — no corpus re-aggregation
  * on the query path (VERDICT r5 #2).
  */
class AnnLshIndexSpec extends AnyFunSuite {
  import TableAssertions.assertSameTable
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def queries(e: DataFrame) =
    e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))

  test("persisted search == inline ann_lsh_topk and ann_lsh_multiprobe") {
    val dir = tmp("graft-lsh-idx")
    val e = Tables.embeddings(spark, d)
    // inline queries score candidates vec_id >= 20 for queries vec_id < 20
    AnnLshIndex.init(e.filter(col("vec_id") >= 20), dir)
    assertSameTable(
      AnnLshIndex.search(spark, dir, queries(e), k = 3, nProbes = 1).orderBy("q_id", "rnk"),
      graft.SparkEntry.queries("ann_lsh_topk")(spark, d),
      "persisted vs inline LSH top-k")
    assertSameTable(
      AnnLshIndex.search(spark, dir, queries(e), k = 3, nProbes = 2).orderBy("q_id", "rnk"),
      graft.SparkEntry.queries("ann_lsh_multiprobe")(spark, d),
      "persisted vs inline LSH multi-probe top-k")
  }

  test("addBatch == rebuild, retry idempotent, stats-after-accept == recomputed stats") {
    val e = Tables.embeddings(spark, d)
    val base = e.filter(col("vec_id") % 7 =!= 3)
    val batch = e.filter(col("vec_id") % 7 === 3)
    val growDir = tmp("graft-lsh-grow")
    AnnLshIndex.init(base, growDir)
    AnnLshIndex.addBatch(spark, batch, growDir, batchId = 1L)
    AnnLshIndex.addBatch(spark, batch, growDir, batchId = 1L) // simulated crash-retry
    val rebuiltDir = tmp("graft-lsh-rebuild")
    AnnLshIndex.init(e, rebuiltDir)
    def vectors(dir: String) =
      spark.read.parquet(s"$dir/vectors").select("vec_id", "embedding", "sig", "sigp")
    assertSameTable(vectors(growDir), vectors(rebuiltDir), "grown vs rebuilt vectors")
    // the stored (accepted) stats must equal stats recomputed from the
    // stored vectors — the guard's input can never drift from the data
    assertSameTable(
      AnnLshIndex.stats(spark, growDir),
      AnnQueries.bucketStats(vectors(growDir)).select(col("sig"), col("n").cast("long").as("n")),
      "stored stats vs recomputed stats")
    assertSameTable(
      AnnLshIndex.search(spark, growDir, queries(e), k = 3, nProbes = 2),
      AnnLshIndex.search(spark, rebuiltDir, queries(e), k = 3, nProbes = 2),
      "search results (grown vs rebuilt)")
  }

  test("refine raises the plane count in place: nesting holds on stored rows, search == fresh init") {
    val e = Tables.embeddings(spark, d)
    val dir = tmp("graft-lsh-refine")
    AnnLshIndex.init(e, dir, numPlanes = 8)
    // materialized: a plan captured before refine() references the
    // pre-swap files (replaceTable fails such stale readers loudly,
    // never silently) — snapshot the rows first
    val before = spark.read.parquet(s"$dir/vectors")
      .select(col("vec_id"), col("sig").as("sig8"), col("sigp").as("sigp8"))
      .localCheckpoint()
    AnnLshIndex.refine(spark, dir, newNumPlanes = 12)
    assert(AnnLshIndex.numPlanes(spark, dir) === 12)
    val after = spark.read.parquet(s"$dir/vectors")
      .select(col("vec_id"), col("sig").as("sig12"), col("sigp").as("sigp12"))
    val j = before.join(after, Seq("vec_id"))
    assert(j.count() === e.count())
    // nesting: the 12-plane signature masked to 8 bits IS the stored
    // 8-plane signature, and the sigp partition value never moved
    assert(j.filter(col("sig12").bitwiseAND(lit(255L)) =!= col("sig8")).count() === 0L)
    assert(j.filter(col("sigp12") =!= col("sigp8")).count() === 0L)
    val freshDir = tmp("graft-lsh-refine-fresh")
    AnnLshIndex.init(e, freshDir, numPlanes = 12)
    assertSameTable(
      AnnLshIndex.search(spark, dir, queries(e), k = 3, nProbes = 2),
      AnnLshIndex.search(spark, freshDir, queries(e), k = 3, nProbes = 2),
      "search (refined vs fresh 12-plane init)")
    // downgrades would merge buckets, not refine — refused loudly
    val ex = intercept[IllegalArgumentException] {
      AnnLshIndex.refine(spark, dir, newNumPlanes = 8)
    }
    assert(ex.getMessage.contains("nest"))
  }

  test("searchInt8 == the same int8 ranking computed inline from raw embeddings") {
    import graft.functions.VectorOps
    import org.apache.spark.sql.expressions.Window
    val dir = tmp("graft-lsh-int8")
    val e = Tables.embeddings(spark, d)
    AnnLshIndex.init(e.filter(col("vec_id") >= 20), dir)
    val stored = AnnLshIndex.searchInt8(spark, dir, queries(e), k = 3, nProbes = 2)
      .orderBy("q_id", "rnk")
    // inline reference: sign + probe with the same UDFs, rank by the
    // same integer dot over codes derived from the raw embeddings
    val cands = e.filter(col("vec_id") >= 20)
      .withColumn("sig", AnnQueries.signatureUdf()(col("embedding")))
      .withColumn("pn", VectorOps.norm(col("embedding"))).filter(col("pn") > 0)
      .withColumn("pm", VectorOps.maxNormed(col("embedding"), col("pn")))
      .select(col("vec_id"), col("sig"),
        VectorOps.int8Code(col("embedding"), col("pn"), col("pm")).as("pq"),
        (col("pm") / lit(127.0)).as("sp"))
    val probes = queries(e)
      .withColumn("qn", VectorOps.norm(col("qv"))).filter(col("qn") > 0)
      .withColumn("qm", VectorOps.maxNormed(col("qv"), col("qn")))
      .select(col("q_id"),
        explode(AnnQueries.probeSigsUdf(AnnQueries.NumPlanes, 2)(col("qv"))).as("sig"),
        VectorOps.int8Code(col("qv"), col("qn"), col("qm")).as("qq"),
        (col("qm") / lit(127.0)).as("sq"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score8").desc, col("vec_id"))
    val inline = cands.join(broadcast(probes), Seq("sig"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("idot",
        aggregate(zip_with(col("pq"), col("qq"), (a, b) => a * b), lit(0L), (a, v) => a + v)
          .cast("long"))
      .withColumn("score8", round(col("idot").cast("double") * col("sp") * col("sq"), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("q_id"), col("vec_id"), col("rnk"), col("idot"), col("score8"))
      .orderBy("q_id", "rnk")
    assertSameTable(stored, inline, "stored-codes vs inline int8 LSH ranking")
    assert(stored.count() > 0)
  }

  test("searchInt8 on a codeless index fails with the explicit rebuild message") {
    val dir = tmp("graft-lsh-nocodes")
    val e = Tables.embeddings(spark, d)
    AnnLshIndex.init(e, dir)
    // simulate a pre-code-storage index: rewrite vectors without pq/sp
    // (np stays — the simulated index has tear detection, just no codes)
    val stripped = spark.read.parquet(s"$dir/vectors")
      .select("vec_id", "embedding", "sig", "sigp", "np").localCheckpoint()
    graft.BatchSink.replaceTable(stripped, s"$dir/vectors", Seq("sigp"))
    val ex = intercept[IllegalArgumentException] {
      AnnLshIndex.searchInt8(spark, dir, queries(e), k = 3)
    }
    assert(ex.getMessage.contains("no stored int8 codes"))
  }

  test("a torn refine (vectors swapped, meta not yet rewritten) fails LOUDLY at search") {
    val dir = tmp("graft-lsh-tear")
    val e = Tables.embeddings(spark, d)
    AnnLshIndex.init(e, dir)
    val np = AnnLshIndex.numPlanes(spark, dir)
    // simulate the refine crash window: stored rows signed in a NEWER
    // plane space than meta pins (equivalently: meta still old). Without
    // the tear detector the (sigp, sig) probe join would just miss —
    // near-zero recall, no error (ADVICE r6).
    import spark.implicits._
    Seq(np + 2).toDF("num_planes").write.mode("overwrite").parquet(s"$dir/meta")
    val ex = intercept[IllegalArgumentException] {
      AnnLshIndex.search(spark, dir, queries(e), k = 3).collect()
    }
    assert(ex.getMessage.contains(s"signed with $np planes but meta pins ${np + 2}"))
    assert(ex.getMessage.contains("re-run refine"))
    // addBatch refuses the torn index too: signed against stale meta it
    // would land OLD-space rows into the new-space table, and a mixed
    // table can false-pass the one-row search-time check
    val exAdd = intercept[IllegalArgumentException] {
      AnnLshIndex.addBatch(spark,
        e.limit(5).select(col("vec_id") + 100000, col("embedding"))
          .toDF("vec_id", "embedding"), dir, batchId = 7L)
    }
    assert(exAdd.getMessage.contains("re-run refine"))
    // and the documented healing path clears the tear: re-running refine
    // to the meta-pinned count makes search work again
    Seq(np).toDF("num_planes").write.mode("overwrite").parquet(s"$dir/meta")
    AnnLshIndex.refine(spark, dir, np + 2)
    assert(AnnLshIndex.search(spark, dir, queries(e), k = 3).count() > 0)
  }

  test("search scan is dynamically pruned to the probed sigp partitions") {
    val dir = tmp("graft-lsh-dpp")
    val e = Tables.embeddings(spark, d)
    AnnLshIndex.init(e, dir)
    val res = AnnLshIndex.search(spark, dir, queries(e).limit(3), k = 3, nProbes = 2)
    res.collect() // settle AQE on the final plan
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(1200))
  }

  test("bucket guard fires loudly from the STORED stats, no corpus re-aggregation") {
    val dir = tmp("graft-lsh-guard")
    val e = Tables.embeddings(spark, d)
    AnnLshIndex.init(e, dir)
    def messageChain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(ex => Option(ex.getMessage).getOrElse("")).toSeq
    val ex = intercept[Throwable] {
      AnnLshIndex.search(spark, dir, queries(e), k = 3, nProbes = 1, maxBucket = 1).count()
    }
    assert(messageChain(ex).exists(_.contains("scale numPlanes")),
      s"guard fired without the numPlanes hint: ${messageChain(ex)}")
  }

  test("compact folds batches into one partition set; search identical; files reduced") {
    val e = Tables.embeddings(spark, d)
    val dir = tmp("graft-lsh-compact")
    AnnLshIndex.init(e.filter(col("vec_id") % 3 === 0), dir)
    AnnLshIndex.addBatch(spark, e.filter(col("vec_id") % 3 === 1), dir, batchId = 1L)
    AnnLshIndex.addBatch(spark, e.filter(col("vec_id") % 3 === 2), dir, batchId = 2L)
    val before = AnnLshIndex.search(spark, dir, queries(e), k = 3, nProbes = 2)
      .collect().map(_.toSeq).toSet
    def parquetFiles(sub: String) = {
      val root = java.nio.file.Paths.get(dir, sub)
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    def batchDirs(sub: String) =
      new java.io.File(s"$dir/$sub").listFiles().count(_.getName.startsWith("batch_id="))
    val filesBefore = parquetFiles("vectors")
    assert(batchDirs("vectors") === 3)
    AnnLshIndex.compact(spark, dir)
    assert(batchDirs("vectors") === 1, "all batches folded into batch 0")
    assert(batchDirs("stats") === 1)
    val filesAfter = parquetFiles("vectors")
    assert(filesAfter < filesBefore, s"compaction must shrink file count: $filesBefore -> $filesAfter")
    val after = AnnLshIndex.search(spark, dir, queries(e), k = 3, nProbes = 2)
      .collect().map(_.toSeq).toSet
    assert(after === before, "search results changed across compaction")
  }

  test("a torn replaceTable swap is healed by recovery, losing no rows") {
    val e = Tables.embeddings(spark, d)
    val dir = tmp("graft-lsh-torn")
    AnnLshIndex.init(e, dir)
    val vecPath = s"$dir/vectors"
    val rows = spark.read.parquet(vecPath).count()
    // simulate the worst crash window of BatchSink.replaceTable: the
    // live table was renamed away and the completed swap not yet
    // renamed in — readers see NO table until recovery runs
    val fs = new org.apache.hadoop.fs.Path(vecPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(vecPath),
      new org.apache.hadoop.fs.Path(vecPath + ".swap"))
    // a COMPLETED swap carries BatchSink's own commit sentinel (written
    // after row-count verification) — fabricate it like replaceTable would
    fs.create(new org.apache.hadoop.fs.Path(vecPath + ".swap/_GRAFT_COMMIT"), true).close()
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/stats"),
      new org.apache.hadoop.fs.Path(vecPath + ".old")) // stale .old rides along
    assert(!fs.exists(new org.apache.hadoop.fs.Path(vecPath)))
    graft.BatchSink.recoverSwap(spark, vecPath)
    assert(fs.exists(new org.apache.hadoop.fs.Path(vecPath)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(vecPath + ".old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(vecPath + ".swap")))
    assert(spark.read.parquet(vecPath).count() === rows, "recovery lost rows")
  }
}
