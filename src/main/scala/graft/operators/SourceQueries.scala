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

  /** doc → real PNG bytes with doc-derived size/shade, decoded back by
    * the real codec: (format, width, height, top-left gray).
    */
  val imageRoundtripUdf = udf { (docId: Long, nChars: Long) =>
    val w = 8 + (docId % 16).toInt
    val h = 8 + (nChars % 16).toInt
    val gray = (docId % 256).toInt
    val m = ImageCodec.decode(ImageCodec.writePng(w, h, gray))
    (m.format, m.width, m.height, m.topLeftGray)
  }

  /** P7: OCR over the doc-derived PNG bytes — the provider decodes real
    * image bytes and emits the reference's full OCRResult struct (text,
    * confidence, detected_languages, bounding_boxes). Serializable
    * provider instance constructed once, reused across rows.
    */
  private val ocrProvider = new graft.pipeline.GridOcrProvider
  private val visionProvider = new graft.pipeline.MetaVisionProvider(ocrProvider)

  val ocrUdf = udf { (docId: Long, nChars: Long) =>
    val w = 8 + (docId % 16).toInt
    val h = 8 + (nChars % 16).toInt
    ocrProvider.recognize(ImageCodec.writePng(w, h, (docId % 256).toInt))
  }

  val visionUdf = udf { (docId: Long, nChars: Long) =>
    val w = 8 + (docId % 16).toInt
    val h = 8 + (nChars % 16).toInt
    visionProvider.describe(ImageCodec.writePng(w, h, (docId % 256).toInt))
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
    // S6: real PNG encode+decode per row (javax.imageio) — the oracle
    // re-derives the doc-determined size/shade arithmetically, so any
    // codec deviation (wrong raster, wrong format name) hash-fails.
    "s6_image_meta" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), imageRoundtripUdf(col("doc_id"), col("n_chars")).as("m"))
        .select(col("doc_id"), col("m._1").as("format"),
          col("m._2").as("width"), col("m._3").as("height"),
          col("m._4").as("top_left_gray"))
        .orderBy("doc_id")
    })
  )

  /** Shared arithmetic re-derivation of the doc-determined image and the
    * GridOcrProvider's line grid (h in [8,24) → 1 or 2 line bands).
    */
  private val ocrBase =
    "SELECT doc_id, 8 + doc_id % 16 AS w, 8 + n_chars % 16 AS h, doc_id % 256 AS g, " +
      "(8 + n_chars % 16) // 8 AS lines, " +
      "(doc_id % 256) * 7 % 51 + 50 AS c0, ((doc_id % 256) * 7 + 13) % 51 + 50 AS c1, " +
      "'line 0: g' || (doc_id % 256) AS l0, 'line 1: g' || (doc_id % 256) AS l1 " +
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
    "s6_image_meta" ->
      ("SELECT doc_id, 'png' AS format, " +
        "CAST(8 + doc_id % 16 AS INT) AS width, " +
        "CAST(8 + n_chars % 16 AS INT) AS height, " +
        "CAST(doc_id % 256 AS INT) AS top_left_gray " +
        "FROM documents ORDER BY doc_id")
  )
}
