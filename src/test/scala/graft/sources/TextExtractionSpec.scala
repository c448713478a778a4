package graft.sources

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The full ingest front door over a mixed-format directory of REAL
  * files: binaryFile scan → extension dispatch → real codecs → the
  * documents-shaped relation → IngestPipeline to vector-store rows.
  * This is the reference's upload-to-embedded lifecycle
  * (text_extraction.py dispatch + process_embedding.py) in one lineage.
  */
class TextExtractionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("mixed-format directory extracts per extension and feeds the pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mixed")
    java.nio.file.Files.write(dir.resolve("a.pdf"),
      PdfCodec.write(Seq("pdf body text", "pdf second page")))
    java.nio.file.Files.write(dir.resolve("b.docx"),
      DocxCodec.write(Seq("docx paragraph one", "docx paragraph two")))
    java.nio.file.Files.write(dir.resolve("c.txt"),
      "plain utf8 text".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("d.md"),
      "# kept as-is markdown".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("e.png"),
      ImageCodec.writePng(10, 7, 42))
    java.nio.file.Files.write(dir.resolve("f.xyz"),
      "unsupported".getBytes("UTF-8"))

    val files = spark.read.format("binaryFile").load(dir.toString)
    val docs = TextExtraction.extract(files)
    val byName = docs.collect().map { r =>
      val name = r.getAs[String]("source").split('/').last
      name -> r.getAs[String]("text")
    }.toMap

    assert(byName.keySet == Set("a.pdf", "b.docx", "c.txt", "d.md", "e.png")) // f.xyz dropped
    assert(byName("a.pdf") == "pdf body text\n\npdf second page")
    assert(byName("b.docx") == "docx paragraph one\n\ndocx paragraph two")
    assert(byName("c.txt") == "plain utf8 text")
    assert(byName("d.md") == "# kept as-is markdown") // markdown kept as-is
    assert(byName("e.png") == "[image png 10x7]")

    // schema is documents-shaped: the rest of the engine runs unchanged
    assert(docs.columns.toSet == Set("doc_id", "source", "text", "n_chars"))
    val points = graft.pipeline.IngestPipeline.run(docs)
    assert(points.count() == 5)
    assert(points.select("point_id").distinct().count() == 5)
  }

  test("image rows tall enough for OCR bands carry OCR text into the relation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ocr")
    java.nio.file.Files.write(dir.resolve("big.png"), ImageCodec.writePng(12, 20, 7))
    val docs = TextExtraction.extract(
      spark.read.format("binaryFile").load(dir.toString))
    val text = docs.select("text").collect().head.getString(0)
    // VisualContent.combined = description + OCR lines (P8 over P7)
    assert(text == "[image png 12x20]\nline 0: g7\nline 1: g7")
  }

  test("non-utf8 txt falls down the charset ladder") {
    val dir = java.nio.file.Files.createTempDirectory("graft-latin")
    java.nio.file.Files.write(dir.resolve("l.txt"), Array[Byte](0xE9.toByte, ' ', 'x'))
    val docs = TextExtraction.extract(
      spark.read.format("binaryFile").load(dir.toString))
    assert(docs.select("text").collect().map(_.getString(0)).toSeq == Seq("é x"))
  }
}
