package graft.pipeline

import graft.sources.ImageCodec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 seams: OCR/vision providers (P7/P8), granular ledger stages
  * (T2), retry orchestration (T3), health probes.
  */
class ProviderSeamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("GridOcrProvider emits the reference OCRResult shape from real bytes") {
    val ocr = new GridOcrProvider
    val r = ocr.recognize(ImageCodec.writePng(12, 20, 42)) // h=20 → 2 line bands
    assert(r.bounding_boxes.length == 2)
    assert(r.text == "line 0: g42\nline 1: g42")
    assert(r.detected_languages == Seq("en"))
    // confidences: ((42*7 + 13i) % 51 + 50)/100
    val c0 = (42 * 7 % 51 + 50) / 100.0
    val c1 = ((42 * 7 + 13) % 51 + 50) / 100.0
    assert(r.bounding_boxes.map(_.confidence) == Seq(c0, c1))
    assert(r.confidence == (c0 * 100 + c1 * 100) / 200.0)
    // bbox is the 4-corner quad the reference emits (ocr_service.py:140)
    assert(r.bounding_boxes(1).bbox == Seq(Seq(0.0, 8.0), Seq(12.0, 8.0), Seq(12.0, 16.0), Seq(0.0, 16.0)))
  }

  test("OCR degrades row-locally on undecodable bytes") {
    val r = new GridOcrProvider().recognize("not an image".getBytes)
    assert(r.text == "" && r.confidence == 0.0 && r.bounding_boxes.isEmpty)
  }

  test("MetaVisionProvider composes VisualContent the way the reference embeds it") {
    val v = new MetaVisionProvider().describe(ImageCodec.writePng(10, 9, 7))
    assert(v.description == "[image png 10x9]")
    assert(v.ocr_text == "line 0: g7")
    assert(v.combined == "[image png 10x9]\nline 0: g7")
    assert(v.detected_elements == Seq("text"))
    // sub-band-height image → description only (no OCR lines)
    val tiny = new MetaVisionProvider().describe(ImageCodec.writePng(5, 5, 1))
    assert(tiny.combined == "[image png 5x5]" && tiny.detected_elements.isEmpty)
  }

  test("retryLoop replays the reference sweep semantics and is a fixed point") {
    val s = spark
    import s.implicits._
    val ledger = Seq(
      (1L, "Failed", 0L),    // succeeds on attempt (1+a)%3==0 → a=2: 1 retry
      (2L, "Failed", 2L),    // attempt 3: (2+3)%3!=0 → fails, rc=3, exhausted
      (3L, "Completed", 0L), // untouched
      (9L, "Failed", 0L)     // (9+3)%3==0 → succeeds on attempt 3, rc=2
    ).toDF("source_drive_file", "status", "retry_count")
    val succeeds = (id: org.apache.spark.sql.Column, a: org.apache.spark.sql.Column) =>
      (id + a) % 3 === 0
    val fin = IngestPipeline.retryLoop(ledger, 3, succeeds)
      .select("source_drive_file", "status", "retry_count")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(fin.toSeq == Seq((1L, "Completed", 1L), (2L, "Failed", 3L),
      (3L, "Completed", 0L), (9L, "Completed", 2L)))
    // idempotent: sweeping a settled ledger changes nothing
    val again = IngestPipeline.retrySweep(IngestPipeline.retryLoop(ledger, 3, succeeds), 3, succeeds)
      .select("source_drive_file", "status", "retry_count")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(again.toSeq == fin.toSeq)
  }

  test("ledgerStages emits the 7-state history for ok files and truncated history + Failed for bad ones") {
    val s = spark
    import s.implicits._
    val files = Seq(
      (1L, "ok.txt", "body text here", 14L),
      (2L, "empty.txt", "   ", 3L)
    ).toDF("doc_id", "source", "text", "n_chars")
    val st = IngestPipeline.ledgerStages(files)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
    val ok = st.filter(_._1 == 1L)
    assert(ok.map(_._3).toSeq == Seq("Queued", "Extracting Text", "Chunking",
      "Enriching Context", "Embedding", "Storing Vectors", "Completed"))
    assert(ok.last._4 == 100.0)
    val bad = st.filter(_._1 == 2L)
    assert(bad.map(_._3).toSeq == Seq("Queued", "Extracting Text", "Failed"))
    assert(bad.last._4 == 15.0) // progress freezes where the job died
  }

  test("embedProgress replays the reference's per-batch counter writes") {
    val s = spark
    import s.implicits._
    // 1201 chars -> 8 fixed chunks (stride 160); batchSize 3 -> batches
    // of processed 3,6,8 — the reference loop's min(i+bs, n) tail and
    // the int(processed/n*80) float-truncate (3/8*80=30, 6/8*80=60,
    // 80 exactly at the end: the loop tops out at 80, never 100)
    val files = Seq(
      (1L, "big.txt", "x" * 1201, 1201L),
      (2L, "small.txt", "tiny", 4L),
      (3L, "empty.txt", "  ", 2L)
    ).toDF("doc_id", "source", "text", "n_chars")
    val rows = IngestPipeline.embedProgress(files, graft.PipelineSettings.smallDocs,
        batchSize = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    assert(rows.filter(_._1 == 1L).toSeq == Seq(
      (1L, 1L, 3L, 8L, 30L), (1L, 2L, 6L, 8L, 60L), (1L, 3L, 8L, 8L, 80L)))
    // a file smaller than one batch still gets its single counter write
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 1L, 1L, 1L, 80L)))
    // failed files never reach the embed loop
    assert(!rows.exists(_._1 == 3L))
  }

  test("health probes report ok on the test tables and provider") {
    val rows = HealthProbes.testConnections(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(rows.keySet == Set("embedding_provider", "table:documents",
      "table:embeddings", "collection:embeddings_dim"))
    assert(rows.values.forall(identity))
  }

  test("extract doc_ids are 64-bit: no collisions across 100k paths") {
    val s = spark
    import s.implicits._
    // xxhash64 over distinct sources must stay distinct (the 32-bit
    // hash this replaced collides with ~50% odds at this count)
    val n = s.range(100000)
      .select(concat(lit("/corpus/dir"), (col("id") % 97), lit("/file_"), col("id"), lit(".txt")).as("source"))
      .select(xxhash64(col("source")).as("doc_id"))
      .agg(countDistinct(col("doc_id")))
      .first().getLong(0)
    assert(n == 100000L)
  }
}
