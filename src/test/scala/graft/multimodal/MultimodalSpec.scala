package graft.multimodal

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def media() = {
    val s = spark
    import s.implicits._
    Seq((1L, "alpha payload"), (2L, "beta"), (3L, "gamma delta epsilon"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
  }

  test("stub decoder trait and native metaCols agree") {
    val m = media()
    val viaUdf = IndexedSeq() ++ MultimodalOps.decodeStage(m, "blob", new StubMediaDecoder)
      .select("doc_id", "format", "width", "height", "n_frames")
      .orderBy("doc_id").collect().map(_.toSeq)
    val viaExpr = IndexedSeq() ++ m.select(col("doc_id") +: MultimodalOps.metaCols(col("blob")): _*)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(viaUdf == viaExpr)
  }

  test("decoded dimensions land in the documented ranges") {
    val rows = MultimodalOps.decodeStage(media(), "blob", new StubMediaDecoder).collect()
    rows.foreach { r =>
      assert(Set("png", "jpeg", "webp").contains(r.getAs[String]("format")))
      assert((32 to 256).contains(r.getAs[Int]("width")))
      assert((32 to 256).contains(r.getAs[Int]("height")))
      assert((1 to 4).contains(r.getAs[Int]("n_frames")))
    }
  }

  test("frameSample emits n_frames rows per doc with dense frame_idx") {
    val withMeta = MultimodalOps.decodeStage(media(), "blob", new StubMediaDecoder)
    val sampled = MultimodalOps.frameSample(withMeta)
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n"),
        max(col("frame_idx")).as("mx"),
        first(col("n_frames")).as("nf"))
      .collect()
    sampled.foreach { r =>
      assert(r.getAs[Long]("n") == r.getAs[Int]("nf").toLong)
      assert(r.getAs[Int]("mx") == r.getAs[Int]("nf") - 1)
    }
  }
}
