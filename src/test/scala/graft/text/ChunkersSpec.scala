package graft.text

import org.scalatest.funsuite.AnyFunSuite

class PyStrSpec extends AnyFunSuite {
  test("isUpper matches Python semantics") {
    assert(PyStr.isUpper("HELLO WORLD"))
    assert(PyStr.isUpper("ABC-123"))
    assert(!PyStr.isUpper("Hello"))
    assert(!PyStr.isUpper("12345"))   // no cased char
    assert(!PyStr.isUpper(""))
    assert(PyStr.isUpper("A"))
    // titlecase letters are cased-but-not-upper in CPython (r15):
    // 'DžAAAA'.isupper() is False
    assert(!PyStr.isUpper("ǅAAAA"))
    // supplementary-plane cased letters are seen (Deseret capital/small)
    assert(PyStr.isUpper(new String(Character.toChars(0x10400))))
    assert(!PyStr.isUpper(new String(Character.toChars(0x10428))))
  }

  test("title matches Python semantics") {
    assert(PyStr.title("hello world") == "Hello World")
    assert(PyStr.title("they're bill's") == "They'Re Bill'S") // Python quirk
    assert(PyStr.title("ABC DEF") == "Abc Def")
    assert(PyStr.title("2-in-1 deal") == "2-In-1 Deal")
    // uncased letters do NOT continue a cased run (r15): CPython gives
    // 'הABCDE'.title() == 'הAbcde' — the ה is uncased, so the A still
    // starts a run; the old isLetter-based tracker lowercased it
    assert(PyStr.title("הABCDE") == "הAbcde")
  }
}

class SemanticChunkerSpec extends AnyFunSuite {

  test("header matching: markdown levels") {
    assert(SemanticChunker.matchHeader("# Title") == Some((1, "Title")))
    assert(SemanticChunker.matchHeader("### Sub  ") == Some((3, "Sub")))
    assert(SemanticChunker.matchHeader("####### seven") == None) // >6 hashes is not md... but numbered? no digits → None
  }

  test("header matching: numbered levels include Python trailing-empty quirk") {
    // Python: len("1.".split('.')) == 2
    assert(SemanticChunker.matchHeader("1. Intro") == Some((2, "1. Intro")))
    assert(SemanticChunker.matchHeader("1.2 Methods") == Some((2, "1.2 Methods")))
    assert(SemanticChunker.matchHeader("1.2.3. Deep") == Some((4, "1.2.3. Deep")))
  }

  test("header matching: ALL-CAPS window") {
    assert(SemanticChunker.matchHeader("INTRODUCTION") == Some((1, "Introduction")))
    assert(SemanticChunker.matchHeader("AB") == None)              // too short
    assert(SemanticChunker.matchHeader("A" * 61) == None)          // too long
    assert(SemanticChunker.matchHeader("Intro") == None)
  }

  test("structure-free text yields one Document chunk") {
    val text = "plain words with no structure at all"
    val cs = SemanticChunker.chunk(text)
    // end = len+1: the reference's current_pos counts a phantom trailing
    // newline for the final line (chunking_service.py:283)
    assert(cs == Vector(SemanticChunk(text, "Document", 0, 0, text.length + 1L)))
  }

  test("sections carry header-stack paths") {
    val text = "# A\nalpha\n## B\nbeta\n# C\ngamma"
    // target 4 < every section length, so no cross-section merging occurs
    val cs = SemanticChunker.chunk(text, targetSize = 4)
    assert(cs.map(_.sectionPath) == Vector("A", "A > B", "C"))
    assert(cs.map(_.text) == Vector("alpha", "beta", "gamma"))
    assert(cs.map(_.chunkIndex) == Vector(0, 1, 2))
  }

  test("small sections merge up to target, keeping latest path") {
    val text = "# A\nalpha\n# B\nbeta"
    val cs = SemanticChunker.chunk(text) // default target 2000 — both sections merge
    assert(cs.length == 1)
    assert(cs.head.sectionPath == "B")   // reference quirk: latest path wins
    assert(cs.head.text == "alpha\n\nbeta")
  }

  test("paragraph packing may exceed target by one paragraph") {
    val p1 = "x" * 30; val p2 = "y" * 30; val p3 = "z" * 30
    val text = s"$p1\n\n$p2\n\n$p3"
    val cs = SemanticChunker.chunk(text, targetSize = 50)
    // packing checks BEFORE adding: first chunk = p1+p2 (len 62 > 50)
    assert(cs.map(_.text) == Vector(s"$p1\n\n$p2", p3))
  }

  test("empty and blank input yield no chunks") {
    assert(SemanticChunker.chunk("") == Vector.empty)
    assert(SemanticChunker.chunk("  \n \n ") == Vector.empty)
    assert(SemanticChunker.chunk(null) == Vector.empty)
  }

  test("chunk indices are dense from 0") {
    val text = (1 to 10).map(i => s"# H$i\n" + ("w" * 2500)).mkString("\n")
    val cs = SemanticChunker.chunk(text)
    assert(cs.map(_.chunkIndex) == cs.indices.toVector)
  }
}

class RecursiveChunkerSpec extends AnyFunSuite {

  test("short text is a single chunk") {
    assert(RecursiveChunker.chunk("hello world") == Vector("hello world"))
  }

  test("empty/blank input yields no chunks") {
    assert(RecursiveChunker.chunk("") == Vector.empty)
    assert(RecursiveChunker.chunk("   ") == Vector.empty)
    assert(RecursiveChunker.chunk(null) == Vector.empty)
  }

  test("paragraph separator is preferred") {
    val text = ("a" * 400) + "\n\n" + ("b" * 400) + "\n\n" + ("c" * 400)
    val cs = RecursiveChunker.chunk(text, size = 500, overlap = 100)
    assert(cs.forall(_.length <= 500))
    assert(cs.head.startsWith("a"))
    assert(cs.last.endsWith("c"))
  }

  test("overlap carries tail pieces into the next chunk") {
    val words = (1 to 200).map(i => f"w$i%03d").mkString(" ") // each word 4-5 chars
    val cs = RecursiveChunker.chunk(words, size = 100, overlap = 30)
    assert(cs.length > 1)
    // consecutive chunks share content (the overlap carry)
    cs.sliding(2).foreach { case Vector(a, b) =>
      val tail = a.split(" ").takeRight(2).mkString(" ")
      assert(b.contains(tail.split(" ").last))
    }
  }

  test("every chunk is a contiguous substring of the input") {
    val text = "The quick brown fox. " * 100
    val cs = RecursiveChunker.chunk(text, size = 120, overlap = 40)
    cs.foreach(c => assert(text.contains(c)))
  }

  test("invariants hold for arbitrary word soup (seeded property sweep)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(300)
      val text = Seq.fill(n)(Seq.fill(1 + rnd.nextInt(8))(('a' + rnd.nextInt(26)).toChar).mkString).mkString(" ")
      val cs = RecursiveChunker.chunk(text, size = 100, overlap = 20)
      cs.foreach { c =>
        assert(c.nonEmpty && c.trim == c)
        assert(c.length <= 100, s"oversize chunk for n=$n")
        assert(text.contains(c))
      }
      if (text.trim.nonEmpty) {
        assert(cs.nonEmpty)
        // last chunk reaches the end of the (trimmed) input
        assert(text.trim.endsWith(cs.last.takeRight(math.min(cs.last.length, 8))))
      }
    }
  }

  test("oversize unbroken token falls through to character windows") {
    val word = "x" * 300
    val text = s"start $word end"
    val cs = RecursiveChunker.chunk(text, size = 100, overlap = 20)
    assert(cs.forall(_.length <= 100))
    // the giant token is covered by character windows
    assert(cs.exists(_.startsWith("xxx")))
    assert(cs.head.startsWith("start"))
    assert(cs.last.endsWith("end"))
  }

  test("character base case covers the whole string (seeded sweep)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      val text = "x" * (1 + rnd.nextInt(500))
      val cs = RecursiveChunker.chunk(text, size = 100, overlap = 20, separators = List(""))
      assert(cs.map(_.length).sum >= text.length) // windows cover with overlap
      assert(cs.forall(_.length <= 100))
    }
  }

  test("G3 hybrid: small peer paragraphs merge up to the token budget") {
    // BPE-ish weights: one=1 two=1 three=2 | four=1 five=1 | six=1 ten=1
    // -> p1=4, p2=2, p3(six seven eight nine ten)=1+2+2+1+1=7 > 6 so p3
    // SPLITS (windows "six seven eight nine"=6, "ten"=1); merge then
    // packs p1+p2 (6), leaves the full window, leaves the tail
    val text = "one two three\n\nfour five\n\nsix seven eight nine ten"
    val cs = HybridChunker.chunk(text, maxTokens = 6)
    assert(cs.map(_.text) == Vector("one two three\n\nfour five", "six seven eight nine", "ten"))
    assert(cs.map(_.chunkIndex) == Vector(0, 1, 2))
    assert(cs.forall(_.sectionPath == "Document"))
    // the reference sets start=0, end=len(chunk.text) (chunking_service.py:75-80)
    assert(cs.forall(c => c.startChar == 0L && c.endChar == c.text.length.toLong))
  }

  test("G3 hybrid: a long word costs ceil(len/4) tokens, not 1") {
    // "abcdefgh" (8 chars) costs 2: budget 2 fits it alone; with a
    // 1-token peer the pair (3) overflows and splits at the boundary
    assert(HybridChunker.chunk("abcdefgh", maxTokens = 2).map(_.text) == Vector("abcdefgh"))
    assert(HybridChunker.chunk("abcdefgh xy", maxTokens = 2).map(_.text)
      == Vector("abcdefgh", "xy"))
  }

  test("G3 hybrid: oversized paragraph splits into weighted windows") {
    // w1..w9 weigh 1 (2 chars), w10 weighs 1 (3 chars) -> same windows
    // as the word-count budget for short words
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val cs = HybridChunker.chunk(text, maxTokens = 4)
    assert(cs.map(_.text) == Vector("w1 w2 w3 w4", "w5 w6 w7 w8", "w9 w10"))
    // a straddling heavy word may push a window one past the budget
    // (size-check-before-add): weights 1,1,1,2 -> window0 carries all
    // four (cum before "eeeee" is 3 < 4), weight 5
    val cs2 = HybridChunker.chunk("a b c eeeee x y z w q", maxTokens = 4)
    assert(cs2.head.text == "a b c eeeee")
  }

  test("G3 hybrid: split windows do not merge back over budget") {
    // 5 words at budget 4 -> [4-window, 1-window]; the 1-window must NOT
    // merge into the preceding full window
    val cs = HybridChunker.chunk("a b c d e", maxTokens = 4)
    assert(cs.map(_.text) == Vector("a b c d", "e"))
  }

  test("G3 hybrid: final window pair merges when a straddle leaves room") {
    // weights 1,2,2,2,1,1 at budget 4: windows = [a bbbbb ccccc] (5,
    // straddle), [ddddd e] (3), [f] (1) -> greedy merge packs the final
    // pair (3+1 <= 4) — the exact case the g3 oracle's merge stage
    // replays (tools/proto_g3.py: live on the real corpus too)
    val cs = HybridChunker.chunk("a bbbbb ccccc ddddd e f", maxTokens = 4)
    assert(cs.map(_.text) == Vector("a bbbbb ccccc", "ddddd e\n\nf"))
    assert(cs.map(_.chunkIndex) == Vector(0, 1))
  }

  test("G3 hybrid: blank input yields no chunks; no-paragraph fallback") {
    assert(HybridChunker.chunk("   ").isEmpty)
    assert(HybridChunker.chunk("\n\n \n\n").isEmpty)
    assert(HybridChunker.chunk("solo").map(_.text) == Vector("solo"))
  }
}
