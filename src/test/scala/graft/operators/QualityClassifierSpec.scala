package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins what the quality_classifier hash oracle can't state: that the
  * model actually LEARNS (held-out accuracy beats the majority class by
  * a real margin — a constant predictor or a broken feature hash would
  * pass a pure parity gate), that the learned evidence is the right
  * evidence (the top log-odds buckets are exactly the hash buckets the
  * stopwords land in — the label is a stopword-ratio rule, so a sound
  * fit must concentrate positive log-odds there), and that scoring and
  * prediction are mutually consistent.
  */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def bucket64(tok: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Integer.parseInt(hex.take(4), 16) % 64
  }

  test("held-out accuracy beats the majority class") {
    val rows = graft.SparkEntry.queries("quality_classifier")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getInt(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.length == 500)
    val test = rows.filterNot(_._2)
    assert(test.nonEmpty)
    val posRate = test.count(_._3 == 1).toDouble / test.length
    val majority = math.max(posRate, 1 - posRate)
    val acc = test.count(r => (r._3 == 1) == r._5).toDouble / test.length
    // prototype measured 0.81/0.83 held-out vs 0.58/0.64 majority
    // (tools/proto_nb.py); require a real margin, not a tie
    assert(acc > majority + 0.05,
      s"held-out acc $acc must beat majority $majority by > 0.05")
    // both classes must actually be predicted — an always-one classifier
    // can beat majority on a skewed split without learning anything
    assert(test.exists(_._5) && test.exists(!_._5))
  }

  test("pred is the sign of score") {
    val rows = graft.SparkEntry.queries("quality_classifier")(spark, d)
      .collect().map(r => (r.getDouble(3), r.getBoolean(4)))
    assert(rows.forall { case (score, pred) => pred == (score >= 0.0) })
  }

  test("top log-odds buckets are the stopword buckets") {
    val mdl = graft.SparkEntry.queries("quality_classifier_model")(spark, d)
      .collect().map(r => (r.getInt(0), r.getDouble(3)))
    assert(mdl.length <= 64)
    assert(mdl.map(_._1).distinct.length == mdl.length)
    val stopBuckets = graft.functions.TextOps.Stopwords.map(bucket64).toSet
    // the label counts stopword tokens, so the buckets they hash to must
    // carry the largest positive log-odds once trained
    val topByLo = mdl.sortBy(-_._2).take(stopBuckets.size).map(_._1).toSet
    val hit = (topByLo & stopBuckets).size
    assert(hit >= 2,
      s"expected stopword buckets $stopBuckets among top log-odds $topByLo")
  }
}
