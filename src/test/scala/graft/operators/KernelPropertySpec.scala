package graft.operators

import graft.text.RecursiveChunker

import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized property sweeps over the pure kernels the golden
  * tests pin only pointwise. Deterministic (fixed seed, no wall-clock
  * variance) so a failure is a real counterexample, reproducible from
  * the iteration index alone.
  */
class KernelPropertySpec extends AnyFunSuite {

  private val Alphabet = "abcdefgh \n.".toCharArray
  private def randText(rnd: scala.util.Random, maxLen: Int): String =
    new String(Array.fill(rnd.nextInt(maxLen + 1))(Alphabet(rnd.nextInt(Alphabet.length))))

  test("RecursiveChunker: size bound, substring containment, determinism (500 random cases)") {
    val rnd = new scala.util.Random(0xD5EED1L)
    for (it <- 0 until 500) {
      val size = 20 + rnd.nextInt(180)
      val overlap = rnd.nextInt(size)
      val text = randText(rnd, 3000)
      val chunks = RecursiveChunker.chunk(text, size, overlap)
      val again = RecursiveChunker.chunk(text, size, overlap)
      assert(chunks == again, s"it=$it nondeterministic")
      chunks.zipWithIndex.foreach { case (c, i) =>
        assert(c.nonEmpty, s"it=$it chunk $i empty")
        assert(c.length <= size, s"it=$it chunk $i len ${c.length} > size $size")
        assert(text.contains(c), s"it=$it chunk $i not a substring")
      }
    }
  }

  test("RecursiveChunker: overlap=0 is lossless modulo boundary whitespace (500 random cases)") {
    val rnd = new scala.util.Random(0xD5EED2L)
    for (it <- 0 until 500) {
      val size = 20 + rnd.nextInt(180)
      val text = randText(rnd, 3000)
      val chunks = RecursiveChunker.chunk(text, size, overlap = 0)
      // with no overlap carry, the chunks partition the text exactly;
      // only the per-chunk trim can drop characters, and it drops only
      // whitespace — so the whitespace-stripped concatenation must be
      // the whitespace-stripped input, character for character
      assert(chunks.mkString("").filterNot(_.isWhitespace) ==
        text.filterNot(_.isWhitespace), s"it=$it lost non-whitespace content")
    }
  }

  test("winnowing guarantee: a shared substring of length >= K+W-1 always shares a fingerprint (300 random pairs)") {
    import DedupQueries.winnowFingerprints
    val rnd = new scala.util.Random(0xD5EED3L)
    for (it <- 0 until 300) {
      // two unrelated texts with ONE planted common substring of
      // length >= 12 (K=8, W=5): MOSS's guarantee is that winnowing
      // selects at least one fingerprint inside any such window, so
      // the intersection is provably non-empty — the property that
      // makes the fingerprint a sound blocking key for substring-level
      // dedup (a miss here is a recall bug no pointwise test catches)
      val shared = randText(rnd, 40 + rnd.nextInt(60)).padTo(12, 'x')
      def host(): String = randText(rnd, 200) + shared + randText(rnd, 200)
      val (a, b) = (host(), host())
      val common = winnowFingerprints(a).toSet intersect winnowFingerprints(b).toSet
      assert(common.nonEmpty, s"it=$it shared ${shared.length}-char substring, no shared fingerprint")
    }
  }

  test("winnowing length gate counts code points, not UTF-16 units") {
    import DedupQueries.winnowFingerprints
    // 11 code points -> below the K+W-1 = 12 gate, even though the
    // UTF-16 length is 22; 12 code points -> exactly one window
    val gClef = new String(Character.toChars(0x1D11E))
    assert(winnowFingerprints(gClef * 11).isEmpty)
    assert(winnowFingerprints(gClef * 12).nonEmpty)
    // determinism across invocations
    val t = "the quick brown fox jumps over the lazy dog"
    assert(winnowFingerprints(t) == winnowFingerprints(t))
  }
}
