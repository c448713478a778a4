package graft.functions

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def one(colExpr: org.apache.spark.sql.Column, text: String): String = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("text").select(colExpr.cast("string")).collect()(0).getString(0)
  }

  test("detectedLanguagesCsv flags unicode blocks in fixed order") {
    assert(one(TextOps.detectedLanguagesCsv(col("text")), "hello") == "en")
    assert(one(TextOps.detectedLanguagesCsv(col("text")), "مرحبا hello 中文") == "ar,en,zh")
    assert(one(TextOps.detectedLanguagesCsv(col("text")), "12345") == "")
  }

  test("shingles3Udf emits distinct 3-grams in first-occurrence order") {
    val s = spark
    import s.implicits._
    val out = Seq("a b c d a b c d").toDF("text")
      .select(TextOps.shingles3Udf(col("text")).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("a b c", "b c d", "c d a", "d a b"))
    val short = Seq("x y").toDF("text")
      .select(TextOps.shingles3Udf(col("text")).as("sh")).collect()(0).getSeq[String](0)
    assert(short == Seq("x y"))
  }

  test("charset ladder: utf-8, BOM strip, latin-1 fallback") {
    val s = spark
    import s.implicits._
    def decode(bytes: Array[Byte]): (String, String) = {
      val r = Seq(Tuple1(bytes)).toDF("b")
        .select(TextOps.charsetLadderUdf(col("b")).as("d"))
        .select(col("d._1"), col("d._2")).collect()(0)
      (r.getString(0), r.getString(1))
    }
    assert(decode("plain ascii".getBytes("UTF-8")) == (("plain ascii", "utf-8")))
    assert(decode("héllo".getBytes("UTF-8")) == (("héllo", "utf-8")))
    val bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "x".getBytes("UTF-8")
    assert(decode(bom) == (("x", "utf-8-sig")))
    // 0xE9 alone is invalid UTF-8 → latin-1 é
    assert(decode(Array[Byte](0xE9.toByte)) == (("é", "latin-1")))
  }

  test("minhashBandsUdf: identical texts share all bands, disjoint texts share none") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "entirely different words compose this second document body here")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.minhashBandsUdf(col("text")).as("bands"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L) == rows(2L))
    assert(rows(1L).forall(_.nonEmpty))
    assert(rows(1L).toSet.intersect(rows(3L).toSet).isEmpty)
    assert(rows(1L).length == 4)
  }
}
