package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The corpus is word salad, so `frac_dup5` is 0 on every real doc and
  * the oracle alone would never exercise the duplicated-5-gram branch.
  * Crafted docs pin both rules end to end, including the coverage-union
  * semantics (overlapping repeats counted once per position).
  */
class GopherRepetitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    CurationQueries.gopherRepetition(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getBoolean(3)))).toMap
  }

  test("duplicated 5-gram coverage fires and counts each position once") {
    // doc 1: "a b c d e a b c d e" — the 5-gram "a b c d e" occurs
    // twice; every position is covered -> frac_dup5 = 1.0; flagged.
    // doc 2: no repeated 5-gram -> frac_dup5 = 0.
    val r = run(Seq(
      1L -> "a b c d e a b c d e",
      2L -> "one two three four five six seven"))
    assert(r(1L)._2 == 1.0 && r(1L)._3, s"doc1 should be fully covered: ${r(1L)}")
    assert(r(2L)._2 == 0.0, s"doc2 has no repeated 5-gram: ${r(2L)}")
  }

  test("overlapping occurrences of a repeated 5-gram union their positions") {
    // "a a a a a a" (6 tokens): 5-gram "a a a a a" occurs at i=0 and
    // i=1 (overlap) -> coverage = positions 0..5 = all 6 chars -> 1.0,
    // not 10/6.
    val r = run(Seq(3L -> "a a a a a a"))
    assert(r(3L)._2 == 1.0, s"overlap must not double-count: ${r(3L)}")
  }

  test("top-2-gram char fraction follows the most frequent pair") {
    // "xy xy xy zz" -> 2-grams: (xy xy)x2, (xy zz)x1; top pair "xy xy"
    // covers 2*(2+2)=8 of alpha=8 chars -> frac_top2 = 1.0, flagged.
    val r = run(Seq(4L -> "xy xy xy zz"))
    assert(r(4L)._1 == 1.0 && r(4L)._3, s"top2 mass: ${r(4L)}")
    // balanced doc: every 2-gram unique -> top cnt 1; "ab cd ef gh":
    // top gram count 1 * glen 4 / alpha 8 = 0.5 — short docs sit above
    // the 0.20 threshold naturally (any one pair is a big char share),
    // which is WHY Gopher applies the rule after a min-length gate;
    // the fraction itself is the contract here
    val r2 = run(Seq(5L -> "ab cd ef gh"))
    assert(r2(5L)._1 == 0.5, s"unique pairs: ${r2(5L)}")
    // a long-enough balanced doc falls under the threshold
    val longDoc = (0 until 40).map(i => f"w$i%02d").mkString(" ")
    val r3 = run(Seq(8L -> longDoc))
    assert(r3(8L)._1 < 0.20 && !r3(8L)._3, s"long balanced doc: ${r3(8L)}")
  }

  test("degenerate docs: empty text and single token") {
    val r = run(Seq(6L -> "", 7L -> "word"))
    assert(r(6L) == ((0.0, 0.0, false)), s"empty text: ${r(6L)}")
    assert(r(7L) == ((0.0, 0.0, false)), s"single token: ${r(7L)}")
  }
}
