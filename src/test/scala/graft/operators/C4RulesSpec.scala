package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The C4 cleaning battery on crafted docs: each rule must flip in
  * isolation (the corpus itself is punctuation-free word salad, so the
  * oracle only ever sees the all-false branch of the punctuation
  * rules — this spec owns the other branches).
  */
class C4RulesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("each C4 rule flips in isolation; composed keep requires all") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "One full sentence here. Another one follows! A third is asked?"), // keeps
      (2L, "Too few. Sentences here."),                        // n_sentences = 2 → drop
      (3L, "Short. One. Two."),                                // 3 sentences but <5 words → drop
      (4L, "One full sentence here. Another one follows! No terminal punct at the end"), // drop
      (5L, "One full sentence here. Another lorem ipsum one! A third is asked?"), // lorem → drop
      (6L, "One full sentence here. Another {brace} one! A third is asked?")      // brace → drop
    ).toDF("doc_id", "text")
    val out = CurationQueries.c4Rules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getAs[Boolean]("keep"), "doc 1 satisfies every rule")
    assert(!out(2L).getAs[Boolean]("keep") && out(2L).getAs[Long]("n_sentences") == 2L)
    assert(!out(3L).getAs[Boolean]("keep") && out(3L).getAs[Long]("n_words") < 5L)
    assert(!out(4L).getAs[Boolean]("keep") && !out(4L).getAs[Boolean]("terminal_punct"))
    assert(!out(5L).getAs[Boolean]("keep") && out(5L).getAs[Boolean]("has_lorem"))
    assert(!out(6L).getAs[Boolean]("keep") && out(6L).getAs[Boolean]("has_brace"))
    // every non-violated flag on the dropped docs still reads true/clean
    assert(out(5L).getAs[Boolean]("terminal_punct") && !out(5L).getAs[Boolean]("has_brace"))
  }
}
