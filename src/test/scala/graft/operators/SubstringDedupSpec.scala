package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contract of the substring-dedup rewrite that the hash
  * oracle can't state directly: exactly the tokens covered by a
  * cross-document duplicated K-run are removed, untouched documents
  * pass through verbatim, and a fully-duplicated document rewrites to
  * the empty string (the Lee-et-al "repeated span" rule at the
  * document boundary).
  */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def words(seed: String, n: Int): String =
    (0 until n).map(i => s"$seed$i").mkString(" ")

  test("removes exactly the cross-doc duplicated 15-token runs") {
    import spark.implicits._
    val shared = (0 until 15).map(i => s"dup$i").mkString(" ")
    val docA = words("a", 10) + " " + shared + " " + words("z", 5) // 30 tokens
    val docB = words("b", 8) + " " + shared                        // 23 tokens
    val docC = words("c", 40)                                      // unique
    val docD = docA                                                // exact copy of A
    val docs = Seq((1L, docA), (2L, docB), (3L, docC), (4L, docD))
      .toDF("doc_id", "text")
    val out = DedupQueries.substringDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // A and D duplicate each other entirely: every 15-span of A exists
    // in D, so every token is covered and the rewrite is empty
    assert(out(1L) == ((30L, 30L, "")))
    assert(out(4L) == ((30L, 30L, "")))
    // B shares only the planted run (its positions 9..23); the b-prefix
    // survives in order
    assert(out(2L) == ((23L, 15L, words("b", 8))))
    // C shares nothing — pass-through, text byte-identical
    assert(out(3L) == ((40L, 0L, docC)))
  }

  test("span length K is the rewrite granularity") {
    import spark.implicits._
    // a shared 10-token run: invisible at K=15, removed at K=10
    val shared = (0 until 10).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, words("a", 12) + " " + shared),
      (2L, words("b", 12) + " " + shared)).toDF("doc_id", "text")
    val at15 = DedupQueries.substringDedup(docs, K = 15).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(at15 == Map(1L -> 0L, 2L -> 0L))
    val at10 = DedupQueries.substringDedup(docs, K = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(at10 == Map(1L -> 10L, 2L -> 10L))
  }

  test("docs shorter than K never form spans and always pass through") {
    import spark.implicits._
    val short = words("s", 5)
    val docs = Seq((1L, short), (2L, short)).toDF("doc_id", "text")
    val out = DedupQueries.substringDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSet == Set((1L, 5L, 0L, short), (2L, 5L, 0L, short)))
  }
}
