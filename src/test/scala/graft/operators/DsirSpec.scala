package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** DSIR selection invariants the hash oracle can't state: the selected
  * set really is the top-100 under (logw desc, doc_id asc) — i.e. rank
  * selection is consistent with the reported weights — and every doc
  * is scored exactly once.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("selected is exactly the top-100 by (logw desc, doc_id)") {
    val rows = graft.SparkEntry.queries("dsir_select")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.length == 500)
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.forall(_._2 > 0))
    val selected = rows.filter(_._4).map(_._1).toSet
    assert(selected.size == 100)
    val expect = rows.sortBy(r => (-r._3, r._1)).take(100).map(_._1).toSet
    assert(selected == expect)
    // weights must discriminate — a constant-weight corpus would make
    // the rank selection vacuous
    assert(rows.map(_._3).distinct.length > 1)
  }
}
