package graft.operators

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edit-distance similarity join: the CORRECTNESS row already proves
  * exact recall against a brute-force DuckDB oracle on the real corpus;
  * this spec pins the contract on crafted corners the corpus may not
  * exercise — found/excluded distances around the K=2 boundary,
  * low-entropy keys that defeat gram-based filters, and filtered ==
  * brute-force equality computed inside Spark on a corpus with hot
  * shared segments.
  */
class EditDistanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def keys(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "key")
  }

  private def pairs(df: DataFrame): Set[(Long, Long, Long)] =
    EditDistanceQueries.editDistanceJoin(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("finds pairs at distance 0/1/2, excludes distance 3") {
    val k = keys(
      1L -> "the quick brown fox jumps high",
      2L -> "the quick brown fox jumps high", // ed 0
      3L -> "the quick brown fox jumps hig", // ed 1 (delete)
      4L -> "the quick brawn fax jumps high", // ed 2 (two substitutions)
      5L -> "the quick brawn fax jumps hi", // ed 4 from 1 (2 subs + 2 deletes)
      6L -> "a completely different sentence")
    val got = pairs(k)
    assert(got.contains((1L, 2L, 0L)))
    assert(got.contains((1L, 3L, 1L)))
    assert(got.contains((1L, 4L, 2L)))
    assert(!got.exists { case (a, b, _) => (a, b) == ((1L, 5L)) },
      "distance-4 pair must be excluded")
    assert(!got.exists { case (a, b, _) => a == 6L || b == 6L })
    // transitive corner: 4 vs 5 is ed 2 (the two deletes) — found even
    // though both ends sit at distance >= 2 from the shared origin
    assert(got.contains((4L, 5L, 2L)))
  }

  test("degenerate low-entropy keys (one distinct gram) are still matched exactly") {
    // "aaaaaa" defeats gram-count filters (one distinct trigram) — the
    // partition filter has no such precondition and must find the pair
    val k = keys(1L -> "aaaaaa", 2L -> "aaaaab", 3L -> "the quick brown fox")
    val got = pairs(k)
    assert(got === Set((1L, 2L, 1L)))
  }

  test("keys of length <= K cannot form K+1 segments and are excluded on both sides") {
    val k = keys(1L -> "ab", 2L -> "ab", 3L -> "abc", 4L -> "abc")
    val got = pairs(k)
    assert(got === Set((3L, 4L, 0L)), s"len-2 keys must be excluded at K=2: $got")
  }

  test("prefix-filtered result equals Spark-side brute force on a hot-gram corpus") {
    // every key shares the hot grams of "lorem ipsum dolor sit amet";
    // mutations at varying positions produce a mix of <=2 and >2 pairs
    val base = "lorem ipsum dolor sit amet consectetur"
    val ks = keys((1L to 40L).map { i =>
      val p = (i % (base.length - 4)).toInt + 2
      val mutated =
        if (i % 4 == 0) base.substring(0, p) + base.substring(p + 1) // delete
        else if (i % 4 == 1) base.substring(0, p) + "z" + base.substring(p + 1) // sub
        else if (i % 4 == 2) base.substring(0, p) + "xy" + base.substring(p) // 2-insert
        else base
      i -> mutated
    }: _*)
    val got = pairs(ks)
    val brute = ks.as("a").crossJoin(ks.as("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("dist", levenshtein(col("a.key"), col("b.key")))
      .filter(col("dist") <= 2)
      .select(col("a.id"), col("b.id"), col("dist").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute, "prefix filtering must lose nothing vs brute force")
    assert(brute.nonEmpty && brute.exists(_._3 == 2L))
  }
}
