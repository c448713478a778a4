package graft.sources

import graft.functions.TextOps
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S1/S4 end-to-end over real files: the `binaryFile` source is the
  * batch form of the reference's drive-file ingest (raw bytes + path
  * metadata), and the charset ladder decodes them — the shape every
  * format reader (S3/S5) plugs into once a JVM codec is available.
  */
class BinaryFileSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("binaryFile source -> charset ladder -> chunker lineage") {
    val dir = java.nio.file.Files.createTempDirectory("graft-src")
    java.nio.file.Files.write(dir.resolve("a.txt"), "alpha beta gamma delta".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("b.txt"), Array[Byte](0xE9.toByte, ' ', 'x')) // latin-1
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.txt")
      .load(dir.toString)
    assert(files.columns.toSet == Set("path", "modificationTime", "length", "content"))
    val decoded = files
      .select(col("path"), TextOps.charsetLadderUdf(col("content")).as("d"))
      .select(col("path"), col("d._1").as("text"), col("d._2").as("encoding"))
      .collect().map(r => (new java.io.File(r.getString(0).stripPrefix("file:")).getName,
        r.getString(1), r.getString(2))).toSet
    assert(decoded == Set(
      ("a.txt", "alpha beta gamma delta", "utf-8"),
      ("b.txt", "é x", "latin-1")))
  }
}
