package graft.operators

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distribution-divergence cards (DriftQueries): the information-theory
  * invariants — KL non-negativity with the zero case exact, JSD
  * contributions exactly zero on identical snapshots, and a planted
  * mover surfacing at rank 1.
  */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  test("domain_kl: every source ≥ 0 (Gibbs), single-source corpus exactly 0") {
    val rows = DriftQueries.queries("domain_kl")(spark, d).collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      assert(r.getAs[Double]("kl_to_corpus") >= 0.0,
        s"${r.getAs[String]("source")}: KL negative — smoothed measures are both proper, impossible")
    }
    import spark.implicits._
    val single = Seq((1L, "a b c a", "en", "only"), (2L, "b c d", "en", "only"))
      .toDF("doc_id", "text", "lang", "source")
    val kl = DriftQueries.domainKl(single).collect()
    assert(kl.length == 1 && kl.head.getAs[Double]("kl_to_corpus") == 0.0,
      "a single-source corpus IS the corpus mixture — KL must be exactly 0")
  }

  test("tokenDrift: identical snapshots give all-zero contributions") {
    import spark.implicits._
    // the same three docs in both halves — per-token ca == cb
    val docs = (0 until 2).flatMap(h => Seq(
      (h * 10 + 1L, "alpha beta gamma", "en", "s"),
      (h * 10 + 2L, "beta gamma delta", "en", "s"),
      (h * 10 + 3L, "gamma delta alpha", "en", "s")))
      .toDF("doc_id", "text", "lang", "source")
    val out = DriftQueries.tokenDrift(docs, col("doc_id") < 10).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("jsd_contrib_micro") == 0.0,
        s"${r.getAs[String]("tok")}: identical counts must contribute exactly 0")
    }
  }

  test("tokenDrift: a planted exclusive token is the top mover") {
    import spark.implicits._
    val docs = (Seq((1L, "alpha beta gamma alpha beta", "en", "s"),
      (2L, "beta gamma alpha beta gamma", "en", "s")) ++
      Seq((11L, "alpha beta gamma alpha beta", "en", "s"),
        (12L, "zzznew zzznew zzznew zzznew zzznew", "en", "s")))
      .toDF("doc_id", "text", "lang", "source")
    val top = DriftQueries.tokenDrift(docs, col("doc_id") < 10).collect()
    assert(top.head.getAs[String]("tok") == "zzznew",
      s"planted mover not at rank 1: ${top.map(_.getAs[String]("tok")).mkString(",")}")
    assert(top.head.getAs[Long]("ca") == 0L && top.head.getAs[Long]("cb") == 5L)
  }
}
