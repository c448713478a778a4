package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Equivalence guards for the r20 optimization round's kernel rewrites:
  * each optimized pure kernel is re-checked against a direct (naive)
  * reimplementation of its pre-optimization definition over seeded
  * random inputs, so a future edit that breaks value-identity fails
  * here instead of at the oracle gate.
  */
class R20KernelEquivalenceSpec extends AnyFunSuite {

  private val Words =
    Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "case", "x1", "the", "of", "a", "éclair", "𝄞")

  private def randTokens(rnd: scala.util.Random, maxLen: Int): Array[String] =
    Array.fill(rnd.nextInt(maxLen + 1))(Words(rnd.nextInt(Words.length)))

  test("spanHashes: rolling form equals direct per-span polynomial (400 random docs)") {
    val rnd = new scala.util.Random(0x52015EEDL)
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < s.length) { h = (h ^ s.charAt(j)) * 0x100000001b3L; j += 1 }
      h
    }
    def direct(ts: Seq[String], k: Int): Seq[Long] =
      if (ts.length < k) Seq.empty
      else (0 to ts.length - k).map { i =>
        var h = 0L
        (i until i + k).foreach(j => h = h * 1099511628211L + fnv(ts(j)))
        h
      }
    for (it <- 0 until 400) {
      val k = 2 + rnd.nextInt(19)
      val ts = randTokens(rnd, 60).toSeq
      assert(DedupQueries.spanHashes(ts, k).toSeq == direct(ts, k), s"it=$it k=$k")
    }
  }

  test("winnowFingerprints: rolling+deque form equals naive O(n*K) definition (400 random docs)") {
    val rnd = new scala.util.Random(0x52015EEEL)
    // the pre-r20 definition, verbatim semantics: full rescan per k-gram
    // hash, full rescan per window minimum, distinct sorted selection
    def naive(text: String): Seq[Long] = {
      val K = 8; val W = 5; val Mod = 1000000007L
      val cps = Option(text).getOrElse("").codePoints().toArray
      if (cps.length < K + W - 1) Seq.empty[Long]
      else {
        val n = cps.length - K + 1
        val hs = Array.tabulate(n) { i =>
          var h = 0L
          (0 until K).foreach(j => h = (h * 31 + cps(i + j)) % Mod)
          h
        }
        val sel = scala.collection.mutable.SortedSet.empty[Long]
        var p = 0
        while (p + W <= n) { sel += hs.slice(p, p + W).min; p += 1 }
        sel.toSeq
      }
    }
    val alphabet = "abcdefgh é中".toCharArray
    for (it <- 0 until 400) {
      val text = new String(Array.fill(rnd.nextInt(200))(alphabet(rnd.nextInt(alphabet.length))))
      assert(DedupQueries.winnowFingerprints(text) == naive(text), s"it=$it")
    }
  }

  test("minhash band minima on raw digest bytes equal hex-string minima (200 random docs)") {
    val rnd = new scala.util.Random(0x52015EEFL)
    // the pre-r20 definition: hex-encode every digest, keep the
    // lexicographically smallest hex per permutation
    def naiveBands(text: String): Seq[String] = {
      val toks = Option(text).getOrElse("").trim.split("\\s+")
      val shs = new scala.collection.mutable.LinkedHashSet[String]
      if (toks.length >= 3) {
        var i = 0
        while (i <= toks.length - 3) { shs.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2)); i += 1 }
      } else shs.add(toks.mkString(" "))
      val md = java.security.MessageDigest.getInstance("MD5")
      val mins = Array.fill[String](16)(null)
      for (sh <- shs; p <- 0 until 16) {
        val hex = md.digest(s"$p:$sh".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (mins(p) == null || hex.compareTo(mins(p)) < 0) mins(p) = hex
      }
      (0 until 4).map(b => (4 * b until 4 * b + 4).map(mins(_)).mkString("_"))
    }
    for (it <- 0 until 200) {
      val text = randTokens(rnd, 40).mkString(" ")
      assert(graft.functions.TextOps.minhashBands(text) == naiveBands(text),
        s"it=$it text=$text")
    }
  }
}
