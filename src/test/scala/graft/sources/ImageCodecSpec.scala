package graft.sources

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S6 over real bytes: javax.imageio PNG encode/decode and the
  * binaryFile → decode lineage over real image files on disk.
  */
class ImageCodecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("png roundtrip recovers format, size and pixel value") {
    val png = ImageCodec.writePng(12, 9, 77)
    assert(png.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)) // real PNG magic
    val m = ImageCodec.decode(png)
    assert(m == ImageMeta("png", 12, 9, 77))
  }

  test("non-image bytes decode to unknown") {
    assert(ImageCodec.decode("not an image".getBytes("UTF-8")).format == "unknown")
  }

  test("binaryFile source over real .png fixtures -> decode -> metadata relation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-img")
    java.nio.file.Files.write(dir.resolve("a.png"), ImageCodec.writePng(16, 8, 10))
    java.nio.file.Files.write(dir.resolve("b.png"), ImageCodec.writePng(9, 21, 200))
    val decodeUdf = udf { (bytes: Array[Byte]) =>
      val m = ImageCodec.decode(bytes)
      (m.format, m.width, m.height, m.topLeftGray)
    }
    val rows = spark.read.format("binaryFile").load(dir.toString)
      .select(decodeUdf(col("content")).as("m"))
      .select(col("m._1"), col("m._2"), col("m._3"), col("m._4"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(rows == Set(("png", 16, 8, 10), ("png", 9, 21, 200)))
  }
}
