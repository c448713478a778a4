package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed goldens for the BPE trainer/encoder (the oracle replay
  * in CurationQueries.bpeCtes mirrors these semantics; tools/proto_bpe.py
  * cross-checks the SQL against a Python port of this object).
  */
class BpeTokenizerSpec extends AnyFunSuite {

  test("merge pass is left-to-right and non-overlapping") {
    assert(BpeTokenizer.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(BpeTokenizer.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(BpeTokenizer.applyMerge(Array("x"), "a", "a").toSeq == Seq("x"))
    assert(BpeTokenizer.applyMerge(Array[String](), "a", "a").toSeq == Seq())
  }

  test("training follows weighted counts with (count desc, pair asc) ties") {
    // round 1: (a,a) = 2*3 + 1*2 = 8 beats (a,b) = 3 + 2 = 5
    // round 2: (a,b) = 3 ties (aa,a) = 3 -> lexicographically smaller
    //          left symbol "a" < "aa" wins
    val merges = BpeTokenizer.train(Seq(("aaab", 3L), ("aab", 2L)), numMerges = 2)
    assert(merges == Seq(("a", "a"), ("a", "b")))
    assert(BpeTokenizer.encodeWord("aaab", merges).toSeq == Seq("aa", "ab"))
    assert(BpeTokenizer.encodeWord("aab", merges).toSeq == Seq("aa", "b"))
    assert(BpeTokenizer.encodeWord("aabb", merges).toSeq == Seq("aa", "b", "b"))
    assert(BpeTokenizer.encodeWord("zq", merges).toSeq == Seq("z", "q"))
  }

  test("training is input-order independent and stops on pair exhaustion") {
    val a = BpeTokenizer.train(Seq(("abc", 1L), ("bcd", 2L), ("cde", 3L)))
    val b = BpeTokenizer.train(Seq(("cde", 3L), ("abc", 1L), ("bcd", 2L)))
    assert(a == b)
    // single-char vocabulary has no pairs at all
    assert(BpeTokenizer.train(Seq(("a", 5L), ("b", 3L))) == Seq())
  }

  test("symbols are code points, not UTF-16 units") {
    val clef = new String(Character.toChars(0x1D11E)) // surrogate pair
    assert(BpeTokenizer.codePointSyms(s"a${clef}b").toSeq == Seq("a", clef, "b"))
  }
}
