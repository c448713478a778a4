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
        "FROM m, unnest(range(m.n_frames)) AS f(i) ORDER BY doc_id, frame_idx")
  )
}
