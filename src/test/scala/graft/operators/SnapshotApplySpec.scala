package graft.operators

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CDC pair's round-trip law: applyDiff(old, snapshotDiff(old, new))
  * must reconstruct `new` exactly — every case (delete, update, insert,
  * untouched) exercised on a hand-built pair where each key hits exactly
  * one case.
  */
class SnapshotApplySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("applyDiff(old, diff(old, new)) == new across all four CDC cases") {
    val s = spark
    import s.implicits._
    // key 1: untouched; key 2: price update; key 3: deleted; key 5: inserted
    val old = Seq((1L, 10.0, "O"), (2L, 20.0, "O"), (3L, 30.0, "F"))
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus")
    val nw = Seq((1L, 10.0, "O"), (2L, 21.5, "O"), (5L, 50.0, "P"))
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus")
    val diff = RelationalQueries.snapshotDiffOf(old, nw)
    val got = diff.orderBy("o_orderkey")
      .select("o_orderkey", "status").as[(Long, String)].collect().toSeq
    assert(got == Seq((2L, "changed"), (3L, "removed"), (5L, "added")))

    val applied = RelationalQueries.applyDiff(
      old.select("o_orderkey", "o_totalprice"), diff,
      "o_orderkey", Map("o_totalprice" -> "new_price"))
      .orderBy("o_orderkey")
      .as[(Long, Double)].collect().toSeq
    assert(applied == Seq((1L, 10.0), (2L, 21.5), (5L, 50.0)))
  }

  test("empty diff applies as identity; diff against empty base inserts everything") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, 10.0, "O"), (2L, 20.0, "O"))
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus")
    val idDiff = RelationalQueries.snapshotDiffOf(old, old)
    assert(idDiff.count() == 0L)
    val applied = RelationalQueries.applyDiff(
      old.select("o_orderkey", "o_totalprice"), idDiff,
      "o_orderkey", Map("o_totalprice" -> "new_price"))
      .orderBy("o_orderkey").as[(Long, Double)].collect().toSeq
    assert(applied == Seq((1L, 10.0), (2L, 20.0)))

    val empty = old.filter(lit(false))
    val allNew = RelationalQueries.snapshotDiffOf(empty, old)
    assert(allNew.select("status").distinct().as[String].collect().toSeq == Seq("added"))
    val bootstrapped = RelationalQueries.applyDiff(
      empty.select("o_orderkey", "o_totalprice"), allNew,
      "o_orderkey", Map("o_totalprice" -> "new_price"))
      .orderBy("o_orderkey").as[(Long, Double)].collect().toSeq
    assert(bootstrapped == Seq((1L, 10.0), (2L, 20.0)))
  }
}
