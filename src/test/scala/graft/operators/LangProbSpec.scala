package graft.operators

import graft.pipeline.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Branch coverage for the P4 probabilistic refinement
  * (TextQueries.langProbabilities). The test corpus only ever exercises
  * the en/no-hit paths (its text is ascii word salad), so the append,
  * unknown-detected, tiebreak, and threshold-boundary branches are
  * driven here with crafted inputs.
  */
class LangProbSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(rows: (Long, String)*): Map[Long, (String, String, Double)] = {
    val s = spark
    import s.implicits._
    TextQueries.langProbabilities(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getDouble(3))))
      .toMap
  }

  test("appends a profiled language the block flags missed") {
    // pure German stopwords: block heuristic flags en (ascii letters),
    // profile scorer appends de with P = 1.0
    val out = run(1L -> "der die und ist nicht")
    assert(out(1L) == (("en,de", "de", 1.0)))
  }

  test("no append at or below the 0.3 threshold (strict >)") {
    // 10 distinct hits split 3 de / 7 en: P(de) = 0.3 exactly — NOT
    // appended (reference uses lang.prob > 0.3, strict)
    val out = run(1L -> "der die das the a and of to in is")
    assert(out(1L)._1 == "en")
    // 4/10 clears it
    val out2 = run(2L -> "der die das und the a and of to in")
    assert(out2(2L)._1 == "en,de")
  }

  test("unknown when neither flags nor profiles match") {
    val out = run(1L -> "12345 67890", 2L -> "")
    assert(out(1L) == (("unknown", "unknown", 0.0)))
    assert(out(2L) == (("unknown", "unknown", 0.0)))
  }

  test("non-Latin flags survive alongside refinement") {
    // Arabic block flag with no profile hits: detected keeps ar, top
    // stays unknown (the scorer only profiles Latin-script languages)
    val out = run(1L -> "مرحبا بكم")
    assert(out(1L) == (("ar", "unknown", 0.0)))
  }

  test("argmax ties break to the ascending profile key") {
    // one de hit, one fr hit: tie at mx=1 resolves to de (asc order);
    // both clear 0.3 so both append after the en flag
    val out = run(1L -> "der le")
    assert(out(1L) == (("en,de,fr", "de", 0.5)))
  }

  test("oracle parity on the corpus-shaped en path") {
    val out = run(1L -> "the a spark table row", 2L -> "spark table row")
    assert(out(1L) == (("en", "en", 1.0)))
    assert(out(2L) == (("en", "unknown", 0.0)))
  }
}
