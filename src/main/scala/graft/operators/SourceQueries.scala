package graft.operators

import graft.Tables
import graft.sources.{DocxCodec, ImageCodec, PdfCodec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Format-source operators (SURVEY.md §2.1 S5): real bytes in, text out.
  * The oracled query round-trips every corpus document through a REAL
  * OOXML archive — ZIP container + WordprocessingML — and extracts it
  * back with the pure-JDK [[DocxCodec]]; the decode side only ever sees
  * the archive bytes. DuckDB cannot read DOCX, so the oracle states the
  * reference's extraction contract (text_extraction.py:95-102:
  * non-blank paragraphs joined "\n\n") over the known paragraph layout,
  * which the extractor must reproduce byte-for-byte to hash-match.
  *
  * Scale shape: encode+decode are per-row map work inside one stage —
  * no shuffle, embarrassingly parallel, the same plan shape a
  * `binaryFile` scan of real .docx files produces (FormatSourcesSpec
  * covers that read path over fixture files on disk).
  */
object SourceQueries {
  type Q = (SparkSession, String) => DataFrame

  // Every query below runs a per-row codec chain (zlib PDF, OOXML
  // zip, javax.imageio, OCR raster) straight off the documents scan.
  // VERDICT r19 what's-wrong #1 flagged these as single-core-starved;
  // r20 measured the fix two ways: ImageIO.setUseCache(false) cut the
  // image kernels ~10x (the real constant was a temp FILE per
  // encode/decode), after which a gated [[Tables.widen]] round-robin
  // exchange is a measured net LOSS on the five ≤0.25 s round-trips
  // (+0.07-0.08 s each at sf0.1 — plans/r20/widen_ab.md) and is
  // applied ONLY to smart_scanned_pdf, whose multi-page OCR raster
  // chain is heavy enough to win 2.8x from it.

  /** doc → real .docx bytes (two paragraphs: body text + a source tag —
    * exercising the paragraph join, not just identity).
    */
  val docxEncodeUdf = udf { (text: String, source: String) =>
    DocxCodec.write(Seq(Option(text).getOrElse(""), "tail:" + source))
  }

  val docxExtractUdf = udf { (bytes: Array[Byte]) => DocxCodec.extractText(bytes) }

  /** doc → real .pdf bytes (two FlateDecode pages), and back. */
  val pdfEncodeUdf = udf { (text: String, source: String) =>
    PdfCodec.write(Seq(Option(text).getOrElse(""), "tail:" + source))
  }

  val pdfExtractUdf = udf { (bytes: Array[Byte]) => PdfCodec.extractText(bytes) }

  /** doc → real image bytes with doc-derived size/shade, decoded back
    * by the real codec: even docs through the lossless PNG rung, odd
    * docs through the lossy JPEG rung (r15 ask #5 — two formats, one
    * dispatch). PNG rows report the exact decoded gray; JPEG rows
    * report only the ±3 closeness flag (see [[graft.sources.ImageCodec
    * .writeJpeg]]'s lossy contract — exact today, not promised), so the
    * oracle never has to replay a lossy codec bit-for-bit.
    */
  val imageRoundtripUdf = udf { (docId: Long, nChars: Long) =>
    val w = 8 + Math.floorMod(docId, 16L).toInt
    val h = 8 + Math.floorMod(nChars, 16L).toInt
    val gray = Math.floorMod(docId, 256L).toInt
    val png = Math.floorMod(docId, 2L) == 0L
    val bytes =
      if (png) ImageCodec.writePng(w, h, gray) else ImageCodec.writeJpeg(w, h, gray)
    val m = ImageCodec.decode(bytes)
    (m.format, m.width, m.height,
      if (png) Some(m.topLeftGray) else None,
      math.abs(m.topLeftGray - gray) <= 3)
  }

  /** P7: OCR over the doc-derived PNG bytes — the provider decodes real
    * image bytes and emits the reference's full OCRResult struct (text,
    * confidence, detected_languages, bounding_boxes). Serializable
    * provider instance constructed once, reused across rows.
    */
  private val ocrProvider = new graft.pipeline.GridOcrProvider
  private val visionProvider = new graft.pipeline.MetaVisionProvider(ocrProvider)

  val ocrUdf = udf { (docId: Long, nChars: Long) =>
    val w = 8 + Math.floorMod(docId, 16L).toInt
    val h = 8 + Math.floorMod(nChars, 16L).toInt
    ocrProvider.recognize(ImageCodec.writePng(w, h, Math.floorMod(docId, 256L).toInt))
  }

  val visionUdf = udf { (docId: Long, nChars: Long) =>
    val w = 8 + Math.floorMod(docId, 16L).toInt
    val h = 8 + Math.floorMod(nChars, 16L).toInt
    visionProvider.describe(ImageCodec.writePng(w, h, Math.floorMod(docId, 256L).toInt))
  }

  /** Single-page PDF encode — the standard-extraction leg of the smart
    * scanned-PDF lineage (no tail page: the raw text is the page).
    */
  val pdfOnePageUdf = udf { (text: String) =>
    PdfCodec.write(Seq(Option(text).getOrElse("")))
  }

  /** Rasterize every synthetic page of a scanned PDF to real PNG bytes
    * and OCR each raster through the provider seam; page texts joined
    * "\n\n" (the reference's OCR service returns one text per file,
    * paginating internally — services/ocr_service.py:81-187). Page
    * geometry varies per page so multi-page OCR is actually exercised.
    */
  val pagesOcrUdf = udf { (docId: Long, nChars: Long, totalPages: Int) =>
    (0 until totalPages).map { p =>
      val w = 8 + Math.floorMod(docId + p, 16L).toInt
      val h = 8 + Math.floorMod(nChars + p, 16L).toInt
      val g = Math.floorMod(docId + p, 256L).toInt
      ocrProvider.recognize(ImageCodec.writePng(w, h, g)).text
    }.filter(_.nonEmpty).mkString("\n\n")
  }

  val queries: Map[String, Q] = Map(
    // P7 (the real A2): avg OCR confidence per document, over the full
    // OCRResult struct — nested bbox corners are projected out so the
    // oracle hash-checks the ArrayType(StructType(bbox,text,confidence))
    // geometry, not just the scalars.
    "p7_ocr_confidence" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), ocrUdf(col("doc_id"), col("n_chars")).as("ocr"))
        .select(col("doc_id"),
          col("ocr.text").as("ocr_text"),
          round(col("ocr.confidence"), 6).as("avg_confidence"),
          size(col("ocr.bounding_boxes")).as("n_boxes"),
          concat_ws(",", col("ocr.detected_languages")).as("langs"),
          col("ocr.bounding_boxes")(0)("bbox")(2)(0).as("box0_x2"),
          col("ocr.bounding_boxes")(0)("bbox")(2)(1).as("box0_y2"),
          round(col("ocr.bounding_boxes")(0)("confidence"), 6).as("box0_conf"))
        .orderBy("doc_id")
    }),
    // P8: vision description over the same bytes — VisualContent
    // (ocr_text, description, combined, detected_elements) with the
    // combined-for-embedding composition the reference uses.
    "p8_vision_describe" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), visionUdf(col("doc_id"), col("n_chars")).as("v"))
        .select(col("doc_id"),
          col("v.description").as("description"),
          col("v.combined").as("combined"),
          concat_ws(",", col("v.detected_elements")).as("elements"))
        .orderBy("doc_id")
    }),
    "s5_docx_roundtrip" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          docxEncodeUdf(col("text"), col("source")).as("docx"))
        .select(col("doc_id"),
          docxExtractUdf(col("docx")).as("extracted"))
        .select(col("doc_id"), col("extracted"),
          length(col("extracted")).cast("long").as("n_chars_extracted"),
          md5(col("extracted").cast("binary")).as("fp"))
        .orderBy("doc_id")
    }),
    // S3: same round-trip discipline through a REAL PDF — valid xref,
    // zlib-compressed content streams (java.util.zip round-trip), text
    // recovered from Tj operators; pages joined "\n\n" (the pdfplumber
    // contract, text_extraction.py:64-75).
    "s3_pdf_roundtrip" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          pdfEncodeUdf(col("text"), col("source")).as("pdf"))
        .select(col("doc_id"),
          pdfExtractUdf(col("pdf")).as("extracted"))
        .select(col("doc_id"), col("extracted"),
          length(col("extracted")).cast("long").as("n_chars_extracted"),
          md5(col("extracted").cast("binary")).as("fp"))
        .orderBy("doc_id")
    }),
    // The reference's extract_text_smart composed end-to-end
    // (tasks/process_embedding.py:293-331): standard extraction (real
    // one-page PDF round-trip), P2's scanned-detection plan
    // (decision_agent.py:176-237 thresholds: avg page text < 100 and
    // any page image ⇒ requires_ocr), then for scanned docs raster →
    // OcrProvider per page, OCR text appended "{text}\n\n{ocr}" (or
    // standing alone when extraction was empty), and the combined text
    // through the same fixed chunk front door every ingest path uses.
    // Per-row map work end to end — the only shuffle is the final sort.
    "smart_scanned_pdf" -> ((s, d) => {
      val hex = md5(col("text").cast("binary"))
      val docs = Tables.widen(Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"), col("text")))
        .select(col("doc_id"), col("n_chars"), col("text"), hex.as("hex"),
          (lit(1) + ascii(substring(hex, 4, 1)) % 4).as("total_pages"))
        .withColumn("extracted", pdfExtractUdf(pdfOnePageUdf(col("text"))))
      val planned = docs
        .withColumn("has_images",
          exists(sequence(lit(0), col("total_pages") - 1),
            p => ascii(col("hex").substr(p + lit(5), lit(1))) % 3 > 0))
        .withColumn("requires_ocr",
          length(trim(col("text"))) < 100 && col("has_images"))
      val combined = planned
        .withColumn("ocr_text",
          when(col("requires_ocr"),
            pagesOcrUdf(col("doc_id"), col("n_chars"), col("total_pages"))))
        .withColumn("combined",
          when(!col("requires_ocr"), col("extracted"))
            .when(col("extracted") === "", col("ocr_text"))
            .otherwise(concat(col("extracted"), lit("\n\n"), col("ocr_text"))))
      combined
        .filter(length(trim(col("combined"))) > 0)
        .select(col("doc_id"), col("requires_ocr"), col("combined"),
          posexplode(sequence(lit(0L),
            greatest(length(col("combined")) - 1, lit(0)).cast("long"), lit(160L)))
            .as(Seq("chunk_index", "start")))
        .select(col("doc_id"), col("requires_ocr"),
          col("chunk_index").cast("long").as("chunk_index"),
          col("combined").substr(col("start") + 1, lit(200)).as("chunk_text"))
        .withColumn("character_count", length(col("chunk_text")).cast("long"))
        .orderBy("doc_id", "chunk_index")
    }),
    // S6: real PNG/JPEG encode+decode per row (javax.imageio; format by
    // doc parity) — the oracle re-derives the doc-determined size/shade
    // arithmetically, so any codec deviation (wrong raster, wrong
    // format name, wrong dispatch) hash-fails. JPEG rows pin dimensions
    // + the ±3 gray-closeness flag, never the exact lossy pixel.
    "s6_image_meta" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), imageRoundtripUdf(col("doc_id"), col("n_chars")).as("m"))
        .select(col("doc_id"), col("m._1").as("format"),
          col("m._2").as("width"), col("m._3").as("height"),
          col("m._4").as("top_left_gray"), col("m._5").as("gray_close"))
        .orderBy("doc_id")
    })
  )

  /** Shared arithmetic re-derivation of the doc-determined image and the
    * GridOcrProvider's line grid (h in [8,24) → 1 or 2 line bands).
    */
  // ((x % m) + m) % m mirrors the UDFs' Math.floorMod (ADVICE r15:
  // xxhash64-minted doc_ids are negative for ~half of real sources;
  // signed % made width/height non-positive and BufferedImage threw)
  private val ocrBase =
    "SELECT doc_id, 8 + ((doc_id % 16) + 16) % 16 AS w, " +
      "8 + ((n_chars % 16) + 16) % 16 AS h, ((doc_id % 256) + 256) % 256 AS g, " +
      "(8 + ((n_chars % 16) + 16) % 16) // 8 AS lines, " +
      "(((doc_id % 256) + 256) % 256) * 7 % 51 + 50 AS c0, " +
      "((((doc_id % 256) + 256) % 256) * 7 + 13) % 51 + 50 AS c1, " +
      "'line 0: g' || (((doc_id % 256) + 256) % 256) AS l0, " +
      "'line 1: g' || (((doc_id % 256) + 256) % 256) AS l1 " +
      "FROM documents"

  val oracles: Map[String, String] = Map(
    "p7_ocr_confidence" ->
      (s"SELECT doc_id, CASE WHEN lines = 2 THEN l0 || chr(10) || l1 ELSE l0 END AS ocr_text, " +
        "round((c0 + CASE WHEN lines = 2 THEN c1 ELSE 0 END) / (100.0 * lines), 6) AS avg_confidence, " +
        "CAST(lines AS INT) AS n_boxes, 'en' AS langs, " +
        "CAST(w AS DOUBLE) AS box0_x2, 8.0 AS box0_y2, " +
        s"round(c0 / 100.0, 6) AS box0_conf FROM ($ocrBase) ORDER BY doc_id"),
    "p8_vision_describe" ->
      (s"SELECT doc_id, description, description || chr(10) || " +
        "(CASE WHEN lines = 2 THEN l0 || chr(10) || l1 ELSE l0 END) AS combined, " +
        "CASE WHEN lines > 1 THEN 'table' ELSE 'text' END AS elements FROM (" +
        s"SELECT *, '[image png ' || w || 'x' || h || ']' AS description FROM ($ocrBase)) " +
        "ORDER BY doc_id"),
    // blank body paragraphs are dropped by the extractor (python-docx
    // `if p.text.strip()`), so a blank doc extracts to just the tag
    "s5_docx_roundtrip" ->
      ("SELECT doc_id, extracted, CAST(length(extracted) AS BIGINT) AS n_chars_extracted, " +
        "md5(extracted) AS fp FROM (" +
        "SELECT doc_id, CASE WHEN trim(text) = '' THEN 'tail:' || source " +
        "ELSE text || chr(10) || chr(10) || 'tail:' || source END AS extracted " +
        "FROM documents) ORDER BY doc_id"),
    // PDF pages with only-whitespace text still count as non-empty under
    // `if page_text` (pdfplumber returns the raw string), but our writer
    // emits the text verbatim and the extractor trims per page — mirror
    // the blank-body case exactly as DOCX does
    "s3_pdf_roundtrip" ->
      ("SELECT doc_id, extracted, CAST(length(extracted) AS BIGINT) AS n_chars_extracted, " +
        "md5(extracted) AS fp FROM (" +
        "SELECT doc_id, CASE WHEN trim(text) = '' THEN 'tail:' || source " +
        "ELSE text || chr(10) || chr(10) || 'tail:' || source END AS extracted " +
        "FROM documents) ORDER BY doc_id"),
    // arithmetic replay of the whole smart lineage: one-page PDF
    // round-trip (verbatim text, blank page dropped), P2 page model
    // (total_pages / per-page images from md5 hex), per-page OCR grid
    // (h//8 lines of "line i: g<gray>", pages joined "\n\n"), the
    // requires_ocr gate, then the fixed-size chunk replay
    "smart_scanned_pdf" ->
      ("""WITH base AS (
        |  SELECT doc_id, n_chars, text, md5(text) AS hex,
        |    1 + ascii(substr(md5(text), 4, 1)) % 4 AS total_pages,
        |    CASE WHEN trim(text) = '' THEN '' ELSE text END AS extracted
        |  FROM documents),
        |pages AS (
        |  SELECT b.doc_id, p.i AS page,
        |    ascii(substr(b.hex, CAST(p.i + 5 AS BIGINT), 1)) % 3 AS page_images,
        |    8 + (((b.n_chars + p.i) % 16) + 16) % 16 AS h,
        |    (((b.doc_id + p.i) % 256) + 256) % 256 AS g
        |  FROM base b, unnest(range(b.total_pages)) AS p(i)),
        |ocr AS (
        |  SELECT doc_id, max(page_images) > 0 AS has_images,
        |    string_agg('line 0: g' || g ||
        |      CASE WHEN h // 8 = 2 THEN chr(10) || 'line 1: g' || g ELSE '' END,
        |      chr(10) || chr(10) ORDER BY page) AS ocr_text
        |  FROM pages GROUP BY doc_id),
        |planned AS (
        |  SELECT b.doc_id,
        |    (length(trim(b.text)) < 100 AND o.has_images) AS requires_ocr,
        |    CASE WHEN NOT (length(trim(b.text)) < 100 AND o.has_images) THEN b.extracted
        |         WHEN b.extracted = '' THEN o.ocr_text
        |         ELSE b.extracted || chr(10) || chr(10) || o.ocr_text END AS combined
        |  FROM base b JOIN ocr o USING (doc_id))
        |SELECT d.doc_id, d.requires_ocr, s.start // 160 AS chunk_index,
        |  substr(d.combined, s.start + 1, 200) AS chunk_text,
        |  length(substr(d.combined, s.start + 1, 200)) AS character_count
        |FROM planned d, unnest(generate_series(0, length(d.combined) - 1, 160)) AS s(start)
        |WHERE length(trim(d.combined)) > 0
        |ORDER BY doc_id, chunk_index""".stripMargin),
    "s6_image_meta" ->
      ("SELECT doc_id, CASE WHEN ((doc_id % 2) + 2) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format, " +
        "CAST(8 + ((doc_id % 16) + 16) % 16 AS INT) AS width, " +
        "CAST(8 + ((n_chars % 16) + 16) % 16 AS INT) AS height, " +
        "CASE WHEN ((doc_id % 2) + 2) % 2 = 0 THEN CAST(((doc_id % 256) + 256) % 256 AS INT) END AS top_left_gray, " +
        "TRUE AS gray_close " +
        "FROM documents ORDER BY doc_id")
  )
}
