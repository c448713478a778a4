package graft.operators

import graft.Tables
import graft.multimodal.MultimodalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column query surface: `documents.text` cast to binary
  * stands in for media payloads (the container has no codecs —
  * SURVEY.md north star / graft.multimodal). Everything here is native
  * expressions over the blob, mirrored in DuckDB over `encode(text)`.
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))

  val queries: Map[String, Q] = Map(
    // Opaque-binary handling: size, content hash, base64 head — the
    // metadata columns any media table carries.
    "mm_binary_meta" -> ((s, d) => {
      media(s, d).select(
        col("doc_id"),
        length(col("blob")).cast("long").as("n_bytes"),
        md5(col("blob")).as("content_md5"),
        substring(base64(col("blob")), 1, 16).as("b64_head"))
        .orderBy("doc_id")
    }),
    // Decode stage (stub codec): typed metadata struct from the payload.
    "mm_decode_meta" -> ((s, d) => {
      val m = media(s, d)
      m.select(col("doc_id") +: MultimodalOps.metaCols(col("blob")): _*)
        .orderBy("doc_id")
    }),
    // Frame-sample generator: one row per sampled frame.
    "mm_frame_sample" -> ((s, d) => {
      val m = media(s, d)
      val withMeta = m.select(col("doc_id") +: MultimodalOps.metaCols(col("blob")): _*)
      MultimodalOps.frameSample(withMeta)
        .select(col("doc_id"), col("format"), col("frame_idx"))
        .orderBy("doc_id", "frame_idx")
    }),
    // P2: PDF content analyzer (reference decision_agent.py:176-237) —
    // the scanned/hybrid/text decision over sampled page stats. Page
    // model from the stub metadata: n_frames is the page count, each
    // synthetic page renders the (single-page) doc's text, per-page
    // image counts derive from md5 hex chars 5.. (0-2 images/page).
    // The reference's exact thresholds: avg_text < 100 & images →
    // 'visual' (+OCR +vision), avg_images > 1 & images → 'hybrid'
    // (+vision), else 'text'; avg_text > 500 → has_tables. All four
    // outcomes occur on the corpus (37 docs < 100 chars, 37 > 500 at
    // sf0.01).
    "p2_pdf_analyze" -> ((s, d) => {
      val hex = md5(col("text").cast("binary"))
      val pageStats = Tables.documents(s, d)
        .select(col("doc_id"), length(trim(col("text"))).cast("long").as("page_text_len"),
          hex.as("hex"), (lit(1) + ascii(substring(hex, 4, 1)) % 4).as("total_pages"))
        .select(col("doc_id"), col("page_text_len"), col("hex"), col("total_pages"),
          posexplode(sequence(lit(0), col("total_pages") - 1)).as(Seq("pp", "page")))
        .select(col("doc_id"), col("total_pages"), col("page_text_len"),
          (ascii(col("hex").substr(col("page") + lit(5), lit(1))) % 3).as("page_images"))
      val agg = pageStats.groupBy(col("doc_id"), col("total_pages"))
        .agg(
          round(avg(col("page_text_len")), 6).as("avg_text"),
          round(avg(col("page_images")), 6).as("avg_images"),
          (max(col("page_images")) > 0).as("has_images"))
      agg.select(
        col("doc_id"), col("total_pages"), col("avg_text"), col("avg_images"),
        col("has_images"),
        when(col("avg_text") < 100 && col("has_images"), "visual")
          .when(col("has_images") && col("avg_images") > 1, "hybrid")
          .otherwise("text").as("strategy"),
        (col("avg_text") < 100 && col("has_images")).as("requires_ocr"),
        ((col("avg_text") < 100 && col("has_images")) ||
          (col("has_images") && col("avg_images") > 1)).as("requires_vision"),
        (col("avg_text") > 500).as("has_tables"))
        .orderBy("doc_id")
    })
  )

  private val metaSql =
    "SELECT doc_id, " +
      "CASE ascii(substr(md5(text), 3, 1)) % 3 WHEN 0 THEN 'png' " +
      "WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format, " +
      "32 * (1 + ascii(substr(md5(text), 1, 1)) % 8) AS width, " +
      "32 * (1 + ascii(substr(md5(text), 2, 1)) % 8) AS height, " +
      "1 + ascii(substr(md5(text), 4, 1)) % 4 AS n_frames " +
      "FROM documents"

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      ("SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "md5(text) AS content_md5, " +
        "substr(to_base64(encode(text)), 1, 16) AS b64_head " +
        "FROM documents ORDER BY doc_id"),
    "mm_decode_meta" ->
      (s"$metaSql ORDER BY doc_id"),
    "mm_frame_sample" ->
      (s"WITH m AS ($metaSql) " +
        "SELECT doc_id, format, CAST(f.i AS INT) AS frame_idx " +
        "FROM m, unnest(range(m.n_frames)) AS f(i) ORDER BY doc_id, frame_idx"),
    "p2_pdf_analyze" ->
      ("WITH pages AS (" +
        "SELECT doc_id, CAST(length(trim(text)) AS BIGINT) AS page_text_len, " +
        "1 + ascii(substr(md5(text), 4, 1)) % 4 AS total_pages, " +
        "ascii(substr(md5(text), CAST(p.i + 5 AS BIGINT), 1)) % 3 AS page_images " +
        "FROM documents, unnest(range(1 + ascii(substr(md5(text), 4, 1)) % 4)) AS p(i)), " +
        "agg AS (SELECT doc_id, total_pages, " +
        "round(avg(page_text_len), 6) AS avg_text, " +
        "round(avg(page_images), 6) AS avg_images, " +
        "max(page_images) > 0 AS has_images " +
        "FROM pages GROUP BY doc_id, total_pages) " +
        "SELECT doc_id, total_pages, avg_text, avg_images, has_images, " +
        "CASE WHEN avg_text < 100 AND has_images THEN 'visual' " +
        "WHEN has_images AND avg_images > 1 THEN 'hybrid' ELSE 'text' END AS strategy, " +
        "(avg_text < 100 AND has_images) AS requires_ocr, " +
        "((avg_text < 100 AND has_images) OR (has_images AND avg_images > 1)) AS requires_vision, " +
        "(avg_text > 500) AS has_tables FROM agg ORDER BY doc_id")
  )
}
