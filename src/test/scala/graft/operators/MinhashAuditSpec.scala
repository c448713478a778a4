package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Internal consistency of the MinHash calibration audit: it covers
  * exactly the LSH candidate pairs, the estimate is a multiple of 1/16
  * in [0, 1], exact Jaccard is positive (band equality implies a shared
  * shingle), and the verdict column restates the |est − exact| bound.
  */
class MinhashAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("audit rows cover the LSH pairs and the verdict matches the bound") {
    val audit = graft.SparkEntry.queries("minhash_jaccard_audit")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    val lsh = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(audit.nonEmpty)
    assert(audit.map(t => (t._1, t._2)).toSet == lsh)
    audit.foreach { case (a, b, est, exact, ok) =>
      val sixteenths = est * 16.0
      assert(math.abs(sixteenths - math.round(sixteenths)) < 1e-9 &&
        est >= 0.0 && est <= 1.0, s"($a,$b) est=$est not a k/16 value")
      assert(exact > 0.0 && exact <= 1.0, s"($a,$b) exact=$exact out of range")
      assert(ok == (math.abs(est - exact) <= 0.375), s"($a,$b) verdict mismatch")
      // LSH candidates share a full band (4 consecutive minima) by
      // construction — the estimate can never be zero for them
      assert(est >= 4.0 / 16.0, s"($a,$b) est=$est below one shared band")
    }
  }
}
