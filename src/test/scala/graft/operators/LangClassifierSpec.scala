package graft.operators

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The trained language-ID model (VERDICT r12 ask #1) against the two
  * claims its queries make:
  *
  *  1. DOMINANCE — held-out accuracy of the trained model strictly
  *     beats the stopword-profile heuristic it replaces, at both test
  *     SFs. Honesty note (mirrored in the query's scaladoc): this
  *     corpus's lang labels carry no lexical signal, so the trained
  *     model's edge comes from the priors its regularization correctly
  *     falls back to — the heuristic structurally can't express priors
  *     (it answers 'unknown' without profile words, never 'zh').
  *  2. LEARNING — on a corpus whose labels DO correlate with tokens,
  *     the same estimator learns the lexical likelihoods and classifies
  *     held-out docs by content, not priors: a manufactured two-language
  *     corpus with disjoint vocabularies classifies perfectly even with
  *     inverted priors. This pins that the dominance above is a
  *     property of correct regularization, not a prior-only degenerate
  *     code path.
  */
class LangClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def accuracies(conf: DataFrame): Map[String, Double] =
    conf.groupBy("method")
      .agg((sum(when(col("lang") === col("pred_lang"), col("n_docs")).otherwise(0L))
        .cast("double") / sum(col("n_docs"))).as("acc"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01"))
    test(s"trained model dominates the stopword heuristic on the held-out split ($d)") {
      val acc = accuracies(graft.SparkEntry.queries("lang_confusion_trained")(spark, d))
      assert(acc.keySet === Set("trained", "stopword_heuristic"), acc.toString)
      assert(acc("trained") > acc("stopword_heuristic"),
        s"trained ${acc("trained")} must beat heuristic ${acc("stopword_heuristic")}")
    }

  test("on a corpus with real lexical signal the model learns it (beats inverted priors)") {
    val s = spark
    import s.implicits._
    // two disjoint vocabularies; 'xx' has 3x the docs of 'yy' so the
    // prior favors xx — a prior-only model would predict xx everywhere,
    // but every held-out yy doc must classify as yy from tokens alone.
    // hashBucket splits both langs across train/test at these ids.
    val xxWords = Seq("kala", "meri", "topu", "vana", "silo")
    val yyWords = Seq("brun", "gest", "ploz", "drek", "fyma")
    def text(ws: Seq[String], seed: Int) =
      (0 until 12).map(i => ws((i * 7 + seed) % ws.length)).mkString(" ")
    val docs = ((0L until 90L).map(i => (i, text(xxWords, i.toInt), "xx")) ++
      (100L until 130L).map(i => (i, text(yyWords, i.toInt), "yy")))
      .toDF("doc_id", "text", "lang")
    val preds = CurationQueries.langScoreDocs(docs,
      CurationQueries.langCountsOf(docs), CurationQueries.langPriorsOf(docs))
    val wrong = CurationQueries.langLabels(docs).filter(!col("tr"))
      .join(preds, Seq("doc_id"))
      .filter(col("lang") =!= col("pred_lang"))
      .count()
    assert(wrong === 0L, s"disjoint-vocabulary corpus must classify perfectly, $wrong wrong")
  }
}
