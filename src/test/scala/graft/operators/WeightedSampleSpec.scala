package graft.operators

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A-ES weighted sampling: the one property the cross-engine oracle
  * cannot check (both engines replay the same formula) is that the
  * formula actually SAMPLES BY WEIGHT — pinned here on crafted
  * corpora: heavy items dominate the sample, zero/negative weights are
  * excluded, groups sample independently, and the sample is exactly
  * without-replacement.
  */
class WeightedSampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def items(rows: (Long, String, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "grp", "w")
  }

  test("heavy weights dominate the sample (ES inclusion property)") {
    // 500 heavy (w=200) + 500 light (w=1): with a 200:1 odds ratio a
    // 50-draw without-replacement sample is overwhelmingly heavy; the
    // draw is hash-deterministic so this is a fixed fact, not a flake
    val rows = (1L to 500L).map(i => (i, "g", 200L)) ++
      (501L to 1000L).map(i => (i, "g", 1L))
    val sample = CurationQueries
      .weightedSample(items(rows: _*), "grp", "id", "w", 50)
      .collect()
    assert(sample.length === 50)
    val heavy = sample.count(_.getLong(1) <= 500L)
    assert(heavy >= 45, s"expected heavy-weight dominance, got $heavy/50 heavy")
  }

  test("zero and negative weights are never sampled; groups are independent") {
    val sample = CurationQueries.weightedSample(
        items((1L, "a", 5L), (2L, "a", 0L), (3L, "a", -2L), (4L, "a", 5L),
          (5L, "b", 1L), (6L, "b", 1L), (7L, "b", 1L)),
        "grp", "id", "w", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    val aIds = sample.filter(_._1 == "a").map(_._2)
    assert(aIds === Set(1L, 4L), s"zero/negative-weight ids must be excluded: $sample")
    assert(sample.filter(_._1 == "b").map(_._2).size === 2)
    // without replacement: distinct ids, ranks 1..k per group
    assert(sample.filter(_._1 == "b").map(_._3) === Set(1L, 2L))
  }
}
