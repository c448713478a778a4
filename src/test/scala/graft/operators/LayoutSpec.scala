package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout property: bucketing on bits ≥12 of the interleaved
  * key fixes bits ≥6 of BOTH dimensions inside a bucket, so every
  * bucket's min/max span is ≤ 64 on each dimension — the bound that
  * makes footer-stats pruning effective on either scan predicate. A
  * single-dimension sort gives this bound on one dim and nothing on
  * the other.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("every z-bucket spans ≤ 64 on BOTH dimensions") {
    val rows = graft.SparkEntry.queries("zorder_layout")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lenSpan = r.getAs[Long]("max_len") - r.getAs[Long]("min_len")
      val tokSpan = r.getAs[Long]("max_toks") - r.getAs[Long]("min_toks")
      assert(lenSpan <= 63, s"bucket ${r.get(0)} length span $lenSpan")
      assert(tokSpan <= 63, s"bucket ${r.get(0)} token span $tokSpan")
    }
  }
}
