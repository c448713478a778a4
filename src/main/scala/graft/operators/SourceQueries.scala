package graft.operators

import graft.Tables
import graft.sources.DocxCodec
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
        "FROM documents) ORDER BY doc_id")
  )
}
