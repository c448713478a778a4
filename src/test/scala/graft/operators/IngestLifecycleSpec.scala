package graft.operators

import graft.Tables
import graft.pipeline.{IngestPipeline, SparkTestSession}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The full corpus lifecycle across BOTH persisted indexes (VERDICT r4
  * #5): a batch arrives → dedup against the stored fp/band index →
  * accept survivors → embed (the real `embedStage`) → AnnIndex addBatch
  * → search sees the new vectors — with a crash injected between the
  * dedup-accept and the ANN add, and the WHOLE cycle retried under the
  * same batch id.
  *
  * The load-bearing piece is the batch-pinned `dedupBatch(..., batchId)`
  * read: after the first attempt's `accept` landed, a naive retry would
  * dedup the batch against its own rows and hand the ANN index an EMPTY
  * survivor set — the two indexes would diverge silently (fp says
  * ingested, cells has no vectors). Pinning the index read to batches
  * strictly before the current one makes the retry re-derive the same
  * survivors, so every stage's idempotent sink sees identical rows and
  * the indexes converge to exactly the from-scratch rebuild.
  */
class IngestLifecycleSpec extends AnyFunSuite {
  import TableAssertions.assertSameTable
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  /** Doc-level vectors through the REAL embed stage (deterministic
    * hash-projection provider): (vec_id, embedding).
    */
  private def embedOf(docs: DataFrame): DataFrame =
    IngestPipeline.embedStage(docs.select(col("doc_id"), col("text").as("embedded_text")))
      .select(col("doc_id").as("vec_id"), col("embedding"))

  test("dedup->accept->embed->ANN-add survives a crash+retry between the two index writes") {
    val docs = Tables.documents(spark, d)
    val corpusA = docs.filter(col("doc_id") % 5 =!= 0)
    // the incoming batch: genuinely new docs + exact duplicates of
    // already-accepted corpus docs under fresh ids
    val newDocs = docs.filter(col("doc_id") % 5 === 0)
    val dupDocs = docs.filter(col("doc_id") % 5 === 1)
      .withColumn("doc_id", col("doc_id") + 10000)
    val batch = newDocs.unionByName(dupDocs)

    val dedupDir = java.nio.file.Files.createTempDirectory("graft-lc-dedup").toString
    val annDir = java.nio.file.Files.createTempDirectory("graft-lc-ann").toString
    val embA = embedOf(corpusA)
    DedupIndex.init(corpusA, dedupDir)
    AnnIndex.init(embA, annDir, quantizer = Some(AnnIndex.kmeans(embA, k = 8, iters = 3)))

    // ---- attempt 1: dedup, accept... then CRASH before the ANN add ----
    val survivors1 = DedupIndex.dedupBatch(spark, dedupDir, batch, batchId = 1L)
    val survivorIds = survivors1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivorIds.nonEmpty, "some new docs must survive dedup")
    assert(survivorIds.forall(_ < 10000), "every exact duplicate of the corpus must be dropped")
    DedupIndex.accept(survivors1, dedupDir, batchId = 1L)
    // crash: AnnIndex.addBatch never runs — cells is now BEHIND fp.

    // ---- retry of the whole cycle under the same batch id ----
    val survivors2 = DedupIndex.dedupBatch(spark, dedupDir, batch, batchId = 1L)
    assertSameTable(survivors1, survivors2,
      "retry must re-derive the SAME survivor set (batch-pinned index read)")
    DedupIndex.accept(survivors2, dedupDir, batchId = 1L) // heals its own partition
    AnnIndex.addBatch(spark, embedOf(survivors2), annDir, batchId = 1L)

    // ---- the two indexes are mutually consistent and rebuild-equal ----
    val grown = corpusA.unionByName(survivors2.drop("fp"))
    val fpStored = spark.read.parquet(s"$dedupDir/fp").select("fp")
    assertSameTable(fpStored, DedupIndex.fingerprints(grown), "fp index vs rebuild")
    val cellsStored = spark.read.parquet(s"$annDir/cells")
      .select("vec_id", "embedding", "cell")
    val storedCents = spark.read.parquet(s"$annDir/centroids").select("c_id", "cv")
    assertSameTable(cellsStored, AnnIndex.assign(embedOf(grown), storedCents),
      "inverted file vs rebuild over the grown corpus")
    // every accepted document has exactly one vector — fp and cells agree
    assert(cellsStored.select("vec_id").distinct().count() ===
      grown.select("doc_id").distinct().count())

    // ---- and search actually sees the new vectors ----
    val probeId = survivorIds.min
    val query = embedOf(survivors2.filter(col("doc_id") === probeId))
      .select(lit(-1L).as("q_id"), col("embedding").as("qv"))
    val hits = AnnIndex.search(spark, annDir, query, nprobe = 2, k = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(hits.contains(probeId),
      s"search over the grown index must return the newly added doc $probeId (got $hits)")
  }
}
