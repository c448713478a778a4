package graft.sources

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source-format coverage beyond parquet: CSV with explicit schema +
  * header, and JSON Lines — the two interchange formats a pipeline
  * ingests besides columnar. Round-trips a documents sample through
  * both and re-runs a pipeline stage on each to prove the lineage is
  * format-agnostic.
  */
class FormatSourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("source", StringType),
    StructField("lang", StringType),
    StructField("n_chars", LongType),
    StructField("text", StringType)))

  private def sample() = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "srcA", "en", 22L, "alpha beta gamma delta"),
      (2L, "srcB", "de", 17L, "eins, zwei; \"drei\""),  // quoting stress
      (3L, "srcC", "en", 9L, "tiny text"))
      .toDF("doc_id", "source", "lang", "n_chars", "text")
  }

  test("CSV round-trip with quoting preserves content; pipeline runs on it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    sample().write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      sample().orderBy("doc_id").collect().map(_.toSeq).toSeq)
    val points = graft.pipeline.IngestPipeline.run(back)
    assert(points.count() > 0)
  }

  test("JSON Lines round-trip preserves content and types") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    sample().write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      sample().orderBy("doc_id").collect().map(_.toSeq).toSeq)
    val ledger = graft.pipeline.IngestPipeline.ledger(back)
    assert(ledger.filter(col("status") === "Completed").count() == 3)
  }
}
