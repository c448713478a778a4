package graft.sources

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's ingest front door, end to end: extension dispatch
  * (S7, text_extraction.py:13-40) over real file bytes → the real
  * format codecs → decoded text, as ONE partition-parallel relation
  * ready for [[graft.pipeline.IngestPipeline]].
  *
  * `extract` is the TextExtractor.extract analog: a per-row total
  * function (unsupported extensions yield null → filtered, the Spark
  * form of the reference's `frappe.throw`). PDF and DOCX route through
  * the real codecs; txt/md through the S4 charset ladder; image
  * formats decode real metadata ([[ImageCodec]]) and emit the vision
  * placeholder the stub provider would describe (P8 stays a seam).
  */
object TextExtraction {

  val SupportedExtensions: Set[String] =
    Set("pdf", "txt", "docx", "md", "jpg", "jpeg", "png", "gif", "webp", "bmp", "tiff", "tif")

  private val extractUdf = udf { (path: String, content: Array[Byte]) =>
    val ext = path.reverse.takeWhile(_ != '.').reverse.toLowerCase
    ext match {
      case "pdf" => PdfCodec.extractText(content)
      case "docx" => DocxCodec.extractText(content)
      case "txt" | "md" =>
        // charset ladder, reusing the S4 decode order
        val utf8 = try {
          val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
            .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
            .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
          Some(dec.decode(java.nio.ByteBuffer.wrap(content)).toString)
        } catch { case _: java.nio.charset.CharacterCodingException => None }
        utf8.getOrElse(new String(content, java.nio.charset.StandardCharsets.ISO_8859_1))
      case e if SupportedExtensions.contains(e) =>
        val m = ImageCodec.decode(content)
        s"[image ${m.format} ${m.width}x${m.height}]"
      case _ => null // unsupported → reference throws; we filter
    }
  }

  /** binaryFile relation (path, content, ...) → (doc_id, source, text,
    * n_chars) — the documents-shaped relation the whole engine runs on.
    */
  def extract(files: DataFrame, pathCol: Column = col("path")): DataFrame =
    files
      .select(pathCol.as("source"), extractUdf(pathCol, col("content")).as("text"))
      .filter(col("text").isNotNull)
      .select(
        abs(hash(col("source"))).cast("long").as("doc_id"),
        col("source"), col("text"),
        length(col("text")).cast("long").as("n_chars"))
}
