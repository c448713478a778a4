package graft.operators

import graft.Tables
import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The embed_neardup demo is O(block²) within a label block by design;
  * its guard must fail the job LOUDLY when any block exceeds the bound
  * so the demo can't be silently reused at a scale where the quadratic
  * blow-up matters (the scale path is embed_neardup_lsh).
  */
class NearDupGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def messageChain(t: Throwable): Seq[String] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq

  test("a label block over the bound fails the job with the demo warning") {
    val ex = intercept[Throwable] {
      VectorQueries.embedNearDupDemo(Tables.embeddings(spark, d), maxBlock = 2).count()
    }
    assert(messageChain(ex).exists(_.contains("O(block^2) DEMO")),
      s"guard fired but without the demo message: ${messageChain(ex)}")
  }

  test("within the bound, the guarded query runs and returns the oracled result shape") {
    val out = graft.SparkEntry.queries("embed_neardup")(spark, d)
    assert(out.columns.toSeq == Seq("label", "id_a", "id_b", "cos"))
    assert(out.count() > 0)
  }
}
