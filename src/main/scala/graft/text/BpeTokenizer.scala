package graft.text

import scala.collection.mutable

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the REAL subword
  * segmentation behind `token_count`'s ceil(len/4) heuristic. Training
  * and application are deliberately factored the way a 100 TB pipeline
  * runs them:
  *
  *  - TRAINING consumes a word-frequency table, not the corpus: the
  *    (word, count) aggregate is the sufficient statistic (HuggingFace
  *    / SentencePiece train exactly this way), so the distributed part
  *    is one partial-agg wordcount + TakeOrdered top-V, and the merge
  *    loop itself runs on V rows on the driver — vocab-sized, not
  *    corpus-sized.
  *  - APPLICATION runs the learned merge cascade once per DISTINCT
  *    word (again vocab-sized), and per-doc token counts are an
  *    integer join+sum over the exploded corpus.
  *
  * Determinism contract (the DuckDB oracle replays training round by
  * round, and the gate hash-compares): pair counts include overlapping
  * occurrences; the best pair maximizes (count, then lexicographically
  * smallest (left, right)); each round merges its pair in ONE
  * left-to-right non-overlapping pass (a merged symbol is the
  * concatenation string, which can never re-form the same pair, so one
  * pass is exhaustive); symbols are Unicode CODE POINTS (matching
  * DuckDB's regexp_extract_all(word, '.')), not UTF-16 units.
  */
object BpeTokenizer {
  /** Training-vocabulary cap (top-V words by count desc, word asc). */
  val VocabCap = 64
  /** Merge rounds learned / replayed. */
  val NumMerges = 8

  private[text] def codePointSyms(word: String): Array[String] =
    word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** UTF-8 byte order — the binary string order Spark's sort and
    * DuckDB's ORDER BY both use. See the train() tie-break note.
    */
  private[text] val Utf8Order: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** One left-to-right non-overlapping merge pass. */
  def applyMerge(syms: Array[String], p1: String, p2: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == p1 && syms(i + 1) == p2) {
        out += (p1 + p2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Learn `numMerges` merges from a word-frequency table. Stops early
    * only if no adjacent pair remains anywhere (degenerate corpora —
    * the oracle replay assumes the full merge count, which every real
    * corpus satisfies).
    */
  def train(counts: Seq[(String, Long)],
            numMerges: Int = NumMerges): Seq[(String, String)] = {
    var words = counts.map { case (w, c) => (codePointSyms(w), c) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    for (_ <- 1 to numMerges if continue) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
      if (pairCounts.isEmpty) continue = false
      else {
        val ((p1, p2), _) = pairCounts.minBy { case ((a, b), n) => (-n, a, b) }(
          // UTF-8 BYTE order for the tie-break, not Java's UTF-16 units
          // (review finding r15): the engines' ORDER BY compares UTF-8
          // bytes, where a supplementary-plane symbol sorts ABOVE
          // U+E000..U+FFFF; Java's compareTo puts its lead surrogate
          // BELOW them — a tied count between such pairs would train a
          // different merge here than the oracle replay picks
          Ordering.Tuple3(Ordering.Long, Utf8Order, Utf8Order))
        merges += ((p1, p2))
        words = words.map { case (syms, c) => (applyMerge(syms, p1, p2), c) }
      }
    }
    merges.toSeq
  }

  /** Segment one word: the merge cascade applied in rank order, one
    * pass each — exactly what training did to its own words and what
    * the oracle's per-round recursion replays.
    */
  def encodeWord(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms = codePointSyms(word)
    merges.foreach { case (p1, p2) => syms = applyMerge(syms, p1, p2) }
    syms
  }
}
