package graft.streaming

import graft.pipeline.{CollectionStore, HashProjectionEmbedder, IngestPipeline, SparkTestSession}
import graft.operators.TableAssertions.assertSameTable
import graft.search.SearchService
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** The FLAGSHIP read path end-to-end over the maintained store (VERDICT
  * r14 ask #6 — reference §3.1 + §3.2 joined: search_service.py:63-128
  * reading what process_embedding.py wrote): `ingestRelay` streams the
  * corpus in, `CollectionStore.merge` keeps the point collection
  * current off a CDC diff, and `SearchService.denseTopK` over the
  * store-gated vectors returns EXACTLY what a fresh full-pipeline run
  * on the new snapshot would return — with the relay having embedded
  * only the changed/added docs (no rebuild, no re-embed pass).
  *
  * The corpus is single-chunk docs (< chunk size), so the relay's
  * recursive chunker and the store's fixed chunker agree on
  * chunk_index = 0 and therefore on the content-addressed point ids
  * (T6) — the join key that lets the store act as the liveness
  * authority over the relay's append-only vector log.
  */
class FlagshipLifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("relay → store merge → denseTopK == search over a fresh snapshot (no re-embed)") {
    val s = spark
    import s.implicits._
    graft.expressions.GraftFunctions.register(s) // denseTopK's codegen cosine
    val tmp = java.nio.file.Files.createTempDirectory("graft-flagship").toString
    val in = s"$tmp/in"; val out = s"$tmp/out"; val cp = s"$tmp/cp"
    val store = s"$tmp/points"

    def docsDf(rows: Seq[(Long, String)]) =
      rows.map { case (id, t) => (id, s"src$id", "en", t.length.toLong, t) }
        .toDF("doc_id", "source", "lang", "n_chars", "text")
    val v1rows = (0L until 12L).map(i =>
      i -> s"document $i about topic ${"abc"(i.toInt % 3)} with words ${i * 7}")
    val v1 = docsDf(v1rows)

    // §3.1: stream the v1 corpus through the relay, then seed the store
    docsDf(v1rows).write.mode("append").parquet(in)
    val q1 = EventStreams.ingestRelay(s, in, out, cp)
    try q1.processAllAvailable() finally q1.stop()
    CollectionStore.init(v1, store)

    // v2: doc 3 changed, doc 5 removed, doc 20 added
    val changed = 3L -> "document 3 rewritten entirely about topic c and fresh words"
    val added = 20L -> "document 20 newly arrived about topic a with words 140"
    val v2rows = v1rows.filterNot { case (id, _) => id == 3L || id == 5L } :+
      changed :+ added
    val v2 = docsDf(v2rows)

    // only the changed/added docs travel the feed; the restarted relay
    // picks them up as its next micro-batch
    docsDf(Seq(changed, added)).write.mode("append").parquet(in)
    val q2 = EventStreams.ingestRelay(s, in, out, cp)
    try q2.processAllAvailable() finally q2.stop()
    CollectionStore.merge(s, store, CollectionStore.docDiff(v1, v2), v2)

    // NO RE-PASS: the second batch landed exactly the two fed docs
    val relayRows = s.read.parquet(out)
    assert(relayRows.filter(col("batch_id") === 1L)
      .select("source_drive_file").distinct().collect().map(_.getLong(0)).toSet ==
      Set(3L, 20L), "restarted relay embedded only the fed docs")

    // live vectors: newest batch per point id (a changed doc's point id
    // is unchanged but its embedding moved), gated by the STORE's live
    // point set — the store is the liveness authority, so the removed
    // doc's vector drops here without any delete pass over the log
    val w = Window.partitionBy(col("point_id")).orderBy(col("batch_id").desc)
    val latest = relayRows.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val live = latest.join(
      CollectionStore.read(s, store).select("point_id"), Seq("point_id"), "left_semi")

    // §3.2: dense top-k over the maintained store vs over a FRESH full
    // pipeline run on the v2 snapshot — must agree exactly
    val provider = new HashProjectionEmbedder(64)
    val qv = provider.embed(Seq("topic c fresh words")).head
    val query = Seq(Tuple1(qv)).toDF("qv")
    def topk(vectors: org.apache.spark.sql.DataFrame) =
      SearchService.denseTopK(vectors.select(col("point_id"), col("embedding")),
          query, k = 5, idCol = "point_id")
        .select("point_id", "score")
    assertSameTable(topk(live), topk(IngestPipeline.run(v2)),
      "search over relay+store == search over fresh v2 snapshot")
    assert(live.filter(col("source_drive_file") === 5L).count() == 0,
      "removed doc's vector is not searchable")
    assert(live.count() == v2rows.size.toLong, "one live vector per v2 doc")
  }
}
