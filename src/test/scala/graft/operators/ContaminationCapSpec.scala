package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SEMANTICS of contamination_check's ubiquitous-shingle cap
  * (round-5 fix — the hash gate proves Spark == DuckDB, but both could
  * drift together; this spec pins what the cap is FOR):
  *   - overlap carried by rare shingles IS contamination → reported;
  *   - overlap carried ONLY by a stock phrase shared corpus-wide
  *     (df > cap) is NOT → dropped, and with it the O(df²) hot-key
  *     join blow-up the round-5 multiplicity probe measured.
  */
class ContaminationCapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Same bucket function as CurationQueries.hashBucket. */
  private def bucket(id: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(4)
    (java.lang.Long.parseLong(hex, 16) % 100).toInt
  }

  test("rare-shingle overlap is reported; stock-phrase-only overlap is capped away") {
    val s = spark
    import s.implicits._
    val ids = (0L until 200L)
    val testIds = ids.filter(bucket(_) >= 90)
    val trainIds = ids.filter(bucket(_) < 80)
    assert(testIds.size >= 2 && trainIds.size >= 30, "corpus too small for the split plan")

    // the genuine leak: one test doc and one train doc share a unique
    // 9-word sentence → 7 shared shingles, each df=2 (under the cap)
    val leakTest = testIds.head
    val leakTrain = trainIds.head
    val leaked = "quark meson lepton boson hadron gluon photon neutrino axion"
    // the stock phrase: 29 train docs + 1 test doc all carry it → its
    // shingles have df=30 > 20; the only overlap between stockTest and
    // any train doc
    val stockTest = testIds(1)
    val stockTrains = trainIds.slice(1, 30)
    val stock = "terms and conditions apply see website for details today"

    val rows = ids.map { id =>
      val text =
        if (id == leakTest || id == leakTrain) s"filler$id pad$id $leaked tail$id"
        else if (id == stockTest || stockTrains.contains(id)) s"filler$id pad$id $stock tail$id"
        else s"filler$id pad$id alpha$id beta$id gamma$id delta$id epsilon$id zeta$id"
      (id, s"src$id", "en", text.length.toLong, text)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-contam").toString
    rows.toDF("doc_id", "source", "lang", "n_chars", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = graft.SparkEntry.queries("contamination_check")(spark, dir)
      .select("test_doc", "train_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((leakTest, leakTrain)),
      s"rare-shingle leak ($leakTest, $leakTrain) must be reported: $out")
    assert(!out.exists(_._1 == stockTest),
      s"stock-phrase-only overlap must be capped away, got: ${out.filter(_._1 == stockTest)}")
  }

  test("mass-duplicated verbatim leak is invisible to the cap but loud in contamination_mass") {
    // ADVICE r5: a test doc duplicated verbatim across > cap train docs
    // has EVERY shingle over the cap — contamination_check reports zero
    // exactly when the leak is worst. contamination_mass must surface it
    // via the fp containment count AND a full dropped-shingle mass.
    val s = spark
    import s.implicits._
    val ids = (0L until 300L)
    val testIds = ids.filter(bucket(_) >= 90)
    val trainIds = ids.filter(bucket(_) < 80)
    assert(testIds.size >= 1 && trainIds.size >= 25)
    val massTest = testIds.head
    val massTrains = trainIds.take(25).toSet
    val massText = "mass duplicated leak text appears verbatim in twenty five train documents"
    val rows = ids.map { id =>
      val text =
        if (id == massTest || massTrains.contains(id)) massText
        else s"filler$id pad$id alpha$id beta$id gamma$id delta$id epsilon$id zeta$id"
      (id, s"src$id", "en", text.length.toLong, text)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-contam-mass").toString
    rows.toDF("doc_id", "source", "lang", "n_chars", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // the capped pairwise check is blind to it...
    val pairs = graft.SparkEntry.queries("contamination_check")(spark, dir)
      .filter(org.apache.spark.sql.functions.col("test_doc") === massTest).count()
    assert(pairs === 0L, "every shingle is over the cap, the pair check must report nothing")
    // ...but the mass audit names both the fp containment and the
    // silenced shingle mass
    val row = graft.SparkEntry.queries("contamination_mass")(spark, dir)
      .filter(org.apache.spark.sql.functions.col("test_doc") === massTest)
      .select("exact_train_dups", "dropped_shingles", "total_shingles")
      .head()
    assert(row.getLong(0) === 25L, s"fp containment must count the 25 verbatim train copies: $row")
    assert(row.getLong(1) === row.getLong(2) && row.getLong(2) > 0L,
      s"the whole shingle mass was capped away and must be reported as dropped: $row")
  }
}
