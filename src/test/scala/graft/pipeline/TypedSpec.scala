package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TypedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def files() = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "srcA", "en", 120L, ("alpha beta gamma " * 20).trim),
      (3L, "srcC", "en", 0L, "   "))
      .toDF("doc_id", "source", "lang", "n_chars", "text")
  }

  test("typed points Dataset round-trips the K1 schema with compile-time fields") {
    val pts = Typed.points(files()).collect()
    assert(pts.nonEmpty)
    pts.foreach { p =>
      assert(p.embedding.length == 64)
      assert(p.point_id.length == 32)
      assert(p.total_chunks > 0 && p.chunk_index < p.total_chunks)
    }
  }

  test("typed ledger Dataset maps error_message to Option") {
    val l = Typed.ledger(files()).collect().map(r => r.source_drive_file -> r).toMap
    assert(l(3L).status == "Failed" && l(3L).error_message.contains("empty document"))
    assert(l(1L).status == "Completed" && l(1L).error_message.isEmpty)
  }

  test("typed stage history Dataset carries the 7-state machine") {
    val st = Typed.ledgerStages(files()).collect()
    val ok = st.filter(_.source_drive_file == 1L).sortBy(_.stage_seq)
    assert(ok.map(_.status).last == "Completed" && ok.length == 7)
    val bad = st.filter(_.source_drive_file == 3L).sortBy(_.stage_seq)
    assert(bad.last.status == "Failed" && bad.last.error_message.contains("empty document"))
  }

  test("SQL surface: registered views answer spark.sql over the same tables") {
    graft.Tables.registerViews(spark, "/root/testdata/sf0.001")
    val viaSql = spark.sql(
      "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang").collect()
    val viaDf = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .groupBy(col("lang")).agg(count(lit(1)).as("n")).orderBy("lang").collect()
    assert(viaSql.map(_.toSeq).toSeq == viaDf.map(_.toSeq).toSeq)
    // the custom expression is callable from SQL too
    val c = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c FROM embeddings LIMIT 5").collect()
    c.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }
}
