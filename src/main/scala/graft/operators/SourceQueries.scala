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

  val queries: Map[String, Q] = Map(
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

  val oracles: Map[String, String] = Map(
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
