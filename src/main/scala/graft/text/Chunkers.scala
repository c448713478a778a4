package graft.text

import scala.collection.mutable

/** One produced chunk (mirrors the reference's SemanticChunk dataclass,
  * reference: frappe_data_pipelines/services/chunking_service.py:13-20).
  */
final case class SemanticChunk(
    text: String,
    sectionPath: String,
    chunkIndex: Int,
    startChar: Long,
    endChar: Long)

/** Python string semantics needed for header detection fidelity
  * (SURVEY.md §7.4.4 — Java's Character differs at the edges).
  */
object PyStr {
  /** A CASED code point in Python's sense (Lu/Ll/Lt — the classes
    * str.isupper/str.title case-track on). Uncased letters (CJK,
    * Hebrew, Arabic, digits) are NOT cased: they neither fail isupper
    * nor continue a title() run (review finding r15 — the old
    * `isLetter` definition made 'הABCDE'.title yield 'הabcde' where
    * Python gives 'הAbcde').
    */
  private def isCased(cp: Int): Boolean =
    Character.isUpperCase(cp) || Character.isLowerCase(cp) ||
      Character.getType(cp) == Character.TITLECASE_LETTER

  /** Python `str.isupper`: at least one cased char and EVERY cased char
    * uppercase — a titlecase letter (Dž) is cased-but-not-upper, so it
    * fails the predicate exactly as in CPython (review finding r15: the
    * old form only rejected on lowercase). Iterates CODE POINTS, so
    * supplementary-plane cased letters (Deseret capitals) are seen.
    */
  def isUpper(s: String): Boolean = {
    var hasCased = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (isCased(cp) && !Character.isUpperCase(cp)) return false
      if (Character.isUpperCase(cp)) hasCased = true
      i += Character.charCount(cp)
    }
    hasCased
  }

  /** Python `str.title`: first CASED char of each cased-run titlecased,
    * later cased chars lowercased; uncased code points (apostrophes,
    * digits, CJK) break runs (so "they're" → "They'Re").
    */
  def title(s: String): String = {
    val sb = new StringBuilder(s.length)
    var prevCased = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cased = isCased(cp)
      if (cased && !prevCased) sb.appendAll(Character.toChars(Character.toTitleCase(cp)))
      else if (cased) sb.appendAll(Character.toChars(Character.toLowerCase(cp)))
      else sb.appendAll(Character.toChars(cp))
      prevCased = cased
      i += Character.charCount(cp)
    }
    sb.toString
  }
}

/** G2 — structure-preserving semantic chunker: a faithful pure-Scala
  * re-expression of the reference's SemanticChunker
  * (frappe_data_pipelines/services/chunking_service.py:166-481):
  *
  *  - header detection: markdown `#{1,6}`, numbered `1.2.3.`
  *    (level = Python `num.split('.')` length, trailing dot included),
  *    ALL-CAPS 5–60 chars (level 1, Python title-cased)
  *    — the 'colon' pattern in the reference's HEADER_PATTERNS table is
  *    dead (never consulted by _match_header), so it is omitted here
  *  - section paths = header stack joined " > ", default "Document"
  *  - greedy merge of small sections up to the soft target (2000 chars),
  *    merged section keeps the LATEST section's path (reference quirk)
  *  - paragraph packing per section; a chunk may exceed the target by
  *    one paragraph (reference checks size BEFORE adding)
  *  - the reference's sentence-split fallback (_split_long_text) is dead
  *    code (references an undefined attribute) and is not reproduced
  */
object SemanticChunker {
  val DefaultTargetSize = 2000

  private final case class Section(path: String, text: String, start: Long, end: Long)

  private val MdHeader = "^(#{1,6})\\s+(.+)$".r
  private val NumHeader = "^(\\d+(?:\\.\\d+)*\\.?)\\s+(.+)$".r

  private[text] def matchHeader(rawLine: String): Option[(Int, String)] = {
    val line = rawLine.trim
    if (line.isEmpty) return None
    line match {
      case MdHeader(hashes, title) => Some((hashes.length, title.trim))
      case NumHeader(num, title) =>
        // Python len("1.".split('.')) == 2 — keep trailing empty segment.
        Some((num.split("\\.", -1).length, s"$num ${title.trim}"))
      case _ =>
        if (PyStr.isUpper(line) && {
          // Python len() counts CODE POINTS; String.length counts UTF-16
          // units — they diverge on supplementary-plane letters, which
          // isUpper now admits (Deseret caps)
          val n = line.codePointCount(0, line.length); n >= 5 && n <= 60
        })
          Some((1, PyStr.title(line)))
        else None
    }
  }

  private def detectSections(text: String): Vector[Section] = {
    val sections = Vector.newBuilder[Section]
    var nSections = 0
    val headers = mutable.ArrayBuffer.empty[String]
    val curLines = mutable.ArrayBuffer.empty[String]
    var start = 0L
    var pos = 0L
    def path(): String = if (headers.isEmpty) "Document" else headers.mkString(" > ")
    for (line <- text.split("\n", -1)) {
      val lineStart = pos
      pos += line.length + 1
      matchHeader(line) match {
        case Some((level, title)) =>
          if (curLines.nonEmpty) {
            val sectionText = curLines.mkString("\n")
            if (sectionText.trim.nonEmpty) {
              sections += Section(path(), sectionText.trim, start, lineStart)
              nSections += 1
            }
          }
          headers.dropRightInPlace(math.max(0, headers.length - (level - 1)))
          headers += title
          curLines.clear()
          start = pos
        case None =>
          curLines += line
      }
    }
    if (curLines.nonEmpty) {
      val sectionText = curLines.mkString("\n")
      if (sectionText.trim.nonEmpty) {
        sections += Section(path(), sectionText.trim, start, pos)
        nSections += 1
      }
    }
    if (nSections == 0) Vector(Section("Document", text.trim, 0, text.length.toLong))
    else sections.result()
  }

  private def mergeSmallSections(sections: Vector[Section], target: Int): Vector[Section] = {
    if (sections.length <= 1) return sections
    val merged = Vector.newBuilder[Section]
    var acc: Section = null
    for (section <- sections) {
      if (acc == null) acc = section
      else if (acc.text.length < target)
        acc = Section(section.path, acc.text + "\n\n" + section.text, acc.start, section.end)
      else { merged += acc; acc = section }
    }
    if (acc != null) merged += acc
    merged.result()
  }

  private val ParaSplit = "\n\\s*\n".r

  private def chunkSection(section: Section, startIndex: Int, target: Int): Vector[SemanticChunk] = {
    if (section.text.length <= target)
      return Vector(SemanticChunk(section.text, section.path, startIndex, section.start, section.end))
    val chunks = Vector.newBuilder[SemanticChunk]
    val paragraphs = ParaSplit.split(section.text).iterator.map(_.trim).filter(_.nonEmpty)
    var cur = ""
    var curStart = section.start
    var idx = startIndex
    for (para <- paragraphs) {
      if (cur.length >= target && cur.nonEmpty) {
        chunks += SemanticChunk(cur.trim, section.path, idx, curStart, curStart + cur.length)
        idx += 1
        curStart += cur.length
        cur = para
      } else cur = if (cur.isEmpty) para else cur + "\n\n" + para
    }
    if (cur.trim.nonEmpty)
      chunks += SemanticChunk(cur.trim, section.path, idx, curStart, section.end)
    chunks.result()
  }

  def chunk(text: String, targetSize: Int = DefaultTargetSize): Vector[SemanticChunk] = {
    if (text == null || text.trim.isEmpty) return Vector.empty
    val sections = mergeSmallSections(detectSections(text), targetSize)
    val out = Vector.newBuilder[SemanticChunk]
    var idx = 0
    for (s <- sections) {
      val cs = chunkSection(s, idx, targetSize)
      out ++= cs
      idx += cs.length
    }
    out.result()
  }
}

/** G3 — Docling-style hybrid chunker, re-expressed from the reference's
  * usage of docling-core's HybridChunker
  * (frappe_data_pipelines/services/chunking_service.py:23-124):
  *
  *  1. paragraphs = `text.split("\n\n")`, trimmed, blanks dropped
  *     (the reference builds a DoclingDocument with one PARAGRAPH item
  *     per split piece; falls back to `[text]` when none) — :58-61
  *  2. paragraphs over the token budget are split into budget-sized
  *     windows (HybridChunker's oversize split): word i joins window
  *     `floor(cumBefore / maxTokens)` of its cumulative token weight —
  *     so a window may exceed the budget by at most one straddling
  *     word, mirroring the reference family's size-check-BEFORE-add
  *     quirk, and the windowing is a pure prefix-sum (replayable as
  *     SQL, no sequential state)
  *  3. consecutive small pieces are merged while the combined token
  *     count stays ≤ `maxTokens` (merge_peers=True), joined "\n\n"
  *  4. plain-text docs have no headings, so section_path is always
  *     "Document", and start_char/end_char are 0/len(chunk.text) —
  *     the REFERENCE's own values (:75-80 sets exactly those)
  *
  * Token budget unit: docling counts BPE tokens via a HuggingFace
  * tokenizer; with no model shipped here, a word costs
  * [[tokenWeight]] = ceil(len/4) tokens — the published
  * ~4-characters-per-token heuristic for BPE vocabularies. Unlike the
  * earlier 1-token-per-word stand-in this tracks what a real
  * tokenizer charges for long words (an 8-char word costs 2), while
  * staying deterministic and engine-replayable (the `g3_hybrid_chunks`
  * oracle re-derives windows AND the final-pair merge from the same
  * per-word weights in DuckDB).
  */
object HybridChunker {
  val DefaultMaxTokens = 512

  /** BPE-ish token cost of one whitespace word: ceil(len/4). */
  private[text] def tokenWeight(word: String): Long = ((word.length + 3) / 4).toLong

  private def words(s: String): Array[String] = s.trim.split("\\s+").filter(_.nonEmpty)

  private[text] def weightOf(piece: String): Long = {
    var acc = 0L
    for (w <- words(piece)) acc += tokenWeight(w)
    acc
  }

  def chunk(text: String, maxTokens: Int = DefaultMaxTokens): Vector[SemanticChunk] = {
    // loud at entry, not ArithmeticException: / by zero deep in the
    // window loop (review finding r15; the sibling APIs validate theirs)
    require(maxTokens >= 1, s"HybridChunker.chunk: maxTokens must be >= 1, got $maxTokens")
    if (text == null || text.trim.isEmpty) return Vector.empty
    val paras0 = text.split("\n\n", -1).toVector.map(_.trim).filter(_.nonEmpty)
    val paras = if (paras0.nonEmpty) paras0 else Vector(text.trim)
    // oversize split: quantized cumulative-weight windows (step 2)
    val pieces = paras.flatMap { p =>
      val w = words(p)
      if (weightOf(p) <= maxTokens) Vector(p)
      else {
        val out = Vector.newBuilder[String]
        var cur = Vector.empty[String]
        var cum = 0L
        var curWin = 0L
        for (t <- w) {
          val win = cum / maxTokens
          if (win != curWin && cur.nonEmpty) {
            out += cur.mkString(" "); cur = Vector.empty; curWin = win
          }
          cur :+= t
          cum += tokenWeight(t)
        }
        if (cur.nonEmpty) out += cur.mkString(" ")
        out.result()
      }
    }
    // merge peers: greedy pack while the combined budget holds
    val merged = Vector.newBuilder[String]
    var cur = Vector.empty[String]
    var curToks = 0L
    for (p <- pieces) {
      val t = weightOf(p)
      if (cur.nonEmpty && curToks + t > maxTokens) {
        merged += cur.mkString("\n\n"); cur = Vector(p); curToks = t
      } else { cur :+= p; curToks += t }
    }
    if (cur.nonEmpty) merged += cur.mkString("\n\n")
    merged.result().zipWithIndex.map { case (t, i) =>
      SemanticChunk(t, "Document", i, 0L, t.length.toLong)
    }
  }
}

/** G1 — recursive character chunker. Semantics (our documented contract,
  * in the spirit of the reference's legacy splitter configured at
  * frappe_data_pipelines/services/chunking_service.py:137-149: separators
  * ["\n\n","\n",". "," ",""], size 1000, overlap 200, strip + drop
  * blanks):
  *
  *  1. choose the first separator that occurs in the text ("" always
  *     matches); split keeping each separator attached to the FOLLOWING
  *     piece, so chunks are contiguous substrings of the input
  *  2. pieces longer than `size` are recursively split with the
  *     remaining separators; "" splits into fixed `size`-char windows
  *     with `size - overlap` stride
  *  3. adjacent small pieces are greedily packed into chunks of at most
  *     `size` chars; when a chunk closes, pieces are retained from its
  *     tail up to `overlap` chars to start the next chunk
  *  4. chunks are trimmed; blank chunks dropped
  */
object RecursiveChunker {
  val DefaultSeparators: List[String] = List("\n\n", "\n", ". ", " ", "")

  def chunk(
      text: String,
      size: Int = 1000,
      overlap: Int = 200,
      separators: List[String] = DefaultSeparators): Vector[String] = {
    if (text == null || text.trim.isEmpty) Vector.empty
    else split(text, separators, size, overlap).map(_.trim).filter(_.nonEmpty)
  }

  private def split(text: String, seps: List[String], size: Int, overlap: Int): Vector[String] = {
    if (text.length <= size) return Vector(text)
    val (sep, rest) = seps.dropWhile(s => s.nonEmpty && !text.contains(s)) match {
      case Nil => ("", Nil)
      case s :: tail => (s, tail)
    }
    if (sep.isEmpty) {
      // character-window base case
      val stride = math.max(1, size - overlap)
      return (0 until text.length by stride).map(i => text.substring(i, math.min(i + size, text.length))).toVector
    }
    val raw = text.split(java.util.regex.Pattern.quote(sep), -1)
    val pieces = raw.head +: raw.tail.map(sep + _)
    val out = Vector.newBuilder[String]
    val good = mutable.ArrayBuffer.empty[String]
    def flush(): Unit = { if (good.nonEmpty) { out ++= merge(good.toVector, size, overlap); good.clear() } }
    for (p <- pieces) {
      if (p.length <= size) { if (p.nonEmpty) good += p }
      else { flush(); out ++= split(p, rest, size, overlap) }
    }
    flush()
    out.result()
  }

  /** Greedy packing with tail-overlap carry (sliding window). */
  private def merge(pieces: Vector[String], size: Int, overlap: Int): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = mutable.Queue.empty[String]
    var total = 0
    for (p <- pieces) {
      if (total + p.length > size && cur.nonEmpty) {
        out += cur.mkString("")
        while (total > overlap || (total + p.length > size && total > 0))
          total -= cur.dequeue().length
      }
      cur += p
      total += p.length
    }
    if (cur.nonEmpty) out += cur.mkString("")
    out.result()
  }
}
