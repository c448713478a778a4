package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, Inflater}

/** S3 — real PDF reading over real bytes, pure JDK. The reference
  * extracts PDF text with pdfplumber and joins non-empty pages with
  * "\n\n" (services/text_extraction.py:64-75); this codec mirrors that
  * contract over genuinely valid PDF files: proper object structure,
  * xref table with byte offsets, and FlateDecode (zlib) content
  * streams, so the decode path exercises a real `Inflater` round-trip,
  * not a string pass-through.
  *
  * The extractor is deliberately minimal-but-real: it walks content
  * streams in document order (our writer emits one stream per page, in
  * page order), inflates `/FlateDecode` streams, and interprets the
  * text-show operators `Tj` / `'` / `"` / `TJ` with full PDF string
  * unescaping (backslash escapes + octal). Layout reconstruction
  * (kerning, columns) is out of scope — the writer encodes each page's
  * text as ONE literal string with raw newlines, which PDF permits.
  */
object PdfCodec extends Serializable {

  // ---- writer ----

  private def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      // a raw CR (or CRLF) inside a literal string is read as a SINGLE
      // 0x0A by spec-conformant readers (PDF 7.3.4.2) — pdfplumber
      // would see \n where we wrote \r; the escape form survives
      // exactly (review finding r15)
      case '\r' => sb.append("\\r")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 32)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Build a valid multi-page PDF: one FlateDecode content stream per
    * page, xref offsets computed for real.
    */
  def write(pages: Seq[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def raw(s: String): Unit = bos.write(s.getBytes(StandardCharsets.UTF_8))
    def obj(body: => Unit): Unit = {
      offsets += bos.size()
      body
    }
    raw("%PDF-1.4\n")
    val n = pages.length
    // object numbering: 1 catalog, 2 pages, then per page i: (3+2i) page,
    // (4+2i) contents, finally (3+2n) font
    val fontObj = 3 + 2 * n
    obj { raw("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n") }
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    obj { raw(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n") }
    pages.zipWithIndex.foreach { case (text, i) =>
      val pageNum = 3 + 2 * i
      val contNum = 4 + 2 * i
      obj {
        raw(s"$pageNum 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 $fontObj 0 R >> >> /Contents $contNum 0 R >> endobj\n")
      }
      val content = s"BT /F1 12 Tf 72 720 Td (${escape(text)}) Tj ET"
      val packed = deflate(content.getBytes(StandardCharsets.UTF_8))
      obj {
        raw(s"$contNum 0 obj << /Length ${packed.length} /Filter /FlateDecode >> stream\n")
        bos.write(packed, 0, packed.length)
        raw("\nendstream endobj\n")
      }
    }
    obj {
      raw(s"$fontObj 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    }
    val xrefPos = bos.size()
    raw(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => raw(f"$o%010d 00000 n \n"))
    raw(s"trailer << /Size ${offsets.length + 1} /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    bos.toByteArray
  }

  // ---- extractor ----

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** None on truncated/corrupt zlib input: `Inflater` silently returns
    * partial output when its input runs out mid-stream, and emitting
    * partial page text would desynchronize extraction with no error —
    * a failed stream is a SKIPPED stream.
    */
  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new ByteArrayOutputStream(data.length * 3 + 64)
      val buf = new Array[Byte](8192)
      // needsDictionary must break the loop (review finding r14): a
      // stream whose zlib header sets FDICT (e.g. bytes 0x78 0x20 —
      // checksum-valid) makes inflate() return 0 forever while neither
      // finished nor needing input, spinning the executor task with no
      // exception and no timeout. Preset dictionaries never appear in
      // PDF FlateDecode — treat as corrupt, i.e. a skipped stream.
      while (!inf.finished() && !inf.needsInput() && !inf.needsDictionary())
        out.write(buf, 0, inf.inflate(buf))
      if (inf.finished()) Some(out.toByteArray) else None
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  // direct lengths only: `/Length 12 0 R` is an INDIRECT reference whose
  // first number is an object id, not a byte count. The `(?!\\d)` anchors
  // the end of the digit run: without it the engine backtracks `\\d{1,18}`
  // to a shorter prefix ("12" → "1") until the indirect-ref lookahead
  // stops matching, extracting a bogus length from every multi-digit
  // indirect reference (and silently truncating >18-digit runs).
  private val LengthRe = "/Length\\s+(\\d{1,18})(?!\\d)(?!\\s*\\d+\\s+R)".r

  /** Page texts in stream order, non-empty pages joined "\n\n"
    * (pdfplumber contract, text_extraction.py:68-75).
    *
    * Stream payloads are sliced by the dict's declared `/Length N` —
    * binary payloads (images, fonts, object streams) in foreign PDFs can
    * legally CONTAIN the byte sequence `endstream`, so scanning for the
    * literal is only the fallback when no /Length is present.
    */
  def extractText(bytes: Array[Byte]): String = {
    val Stream = "stream".getBytes(StandardCharsets.US_ASCII)
    val EndStream = "endstream".getBytes(StandardCharsets.US_ASCII)
    val pages = Vector.newBuilder[String]
    var pos = 0
    var continue = true
    while (continue) {
      val s = indexOf(bytes, Stream, pos)
      if (s < 0) continue = false
      else {
        // dict between the enclosing obj header and 'stream' tells the
        // filter and declared length; the lookback window is cut at the
        // previous object's 'endobj' so an earlier dict's /Length or
        // /FlateDecode can't leak into this stream's parse
        val dictStart = math.max(0, s - 512)
        val window = new String(bytes, dictStart, s - dictStart, StandardCharsets.ISO_8859_1)
        val dict = {
          val cut = window.lastIndexOf("endobj")
          if (cut >= 0) window.substring(cut) else window
        }
        var dataStart = s + Stream.length
        if (dataStart < bytes.length && bytes(dataStart) == '\r') dataStart += 1
        if (dataStart < bytes.length && bytes(dataStart) == '\n') dataStart += 1
        val declared = LengthRe.findAllMatchIn(dict).toSeq.lastOption
          .map(_.group(1).toLong)
          .filter(l => l >= 0 && dataStart + l <= bytes.length)
          // sanity: 'endstream' must follow within the EOL slack the PDF
          // spec allows — a declared length that does NOT land on the
          // stream end (corrupt dict, indirect length that slipped
          // through) falls back to the scan instead of mis-slicing
          .filter { l =>
            val e = indexOf(bytes, EndStream, dataStart + l.toInt)
            e >= 0 && e - (dataStart + l.toInt) <= 8
          }
        val bounds: Option[(Int, Int)] = declared match {
          case Some(len) =>
            val dataEnd = dataStart + len.toInt
            val e = indexOf(bytes, EndStream, dataEnd)
            Some((dataEnd, if (e < 0) dataEnd else e + EndStream.length))
          case None =>
            val e = indexOf(bytes, EndStream, dataStart)
            if (e < 0) None
            else {
              var dataEnd = e
              // strip the EOL the writer put before 'endstream'
              if (dataEnd > dataStart && bytes(dataEnd - 1) == '\n') dataEnd -= 1
              if (dataEnd > dataStart && bytes(dataEnd - 1) == '\r') dataEnd -= 1
              Some((dataEnd, e + EndStream.length))
            }
        }
        bounds match {
          case None => continue = false
          case Some((dataEnd, nextPos)) =>
            val data = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
            val content =
              if (dict.contains("/FlateDecode")) inflate(data) else Some(data)
            content.foreach { c =>
              // operate on byte-chars (latin-1), then restore UTF-8: the
              // writer serialized the text as UTF-8 bytes in the stream
              val raw = textShowOps(new String(c, StandardCharsets.ISO_8859_1))
              val text = new String(raw.getBytes(StandardCharsets.ISO_8859_1),
                StandardCharsets.UTF_8)
              if (text.trim.nonEmpty) pages += text
            }
            pos = nextPos
        }
      }
    }
    pages.result().mkString("\n\n")
  }

  /** Concatenate the strings shown by Tj / ' / " / TJ operators —
    * OPERATOR-AWARE (review finding r15: the old form appended EVERY
    * literal string in the stream, so a foreign PDF's marked-content
    * properties — /ActualText (draft) BDC — or any non-show operand
    * leaked into the page text). Strings accumulate as pending
    * operands; a show operator emits them (Tj/'/" take the last, TJ
    * takes the whole array's worth), any other operator discards them.
    */
  private[sources] def textShowOps(content: String): String = {
    val out = new StringBuilder
    val pending = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < content.length) {
      val c = content.charAt(i)
      if (c == '(') {
        val (str, next) = parseString(content, i)
        pending += str
        i = next
      } else if (c == '\'' || c == '"') { // the ' and " show operators
        pending.lastOption.foreach(out.append)
        pending.clear()
        i += 1
      } else if (c.isLetter) {
        val j0 = i
        while (i < content.length && (content.charAt(i).isLetter || content.charAt(i) == '*')) i += 1
        content.substring(j0, i) match {
          case "Tj" => pending.lastOption.foreach(out.append); pending.clear()
          case "TJ" => pending.foreach(out.append); pending.clear()
          case _ => pending.clear() // some other operator consumed them
        }
      } else i += 1
    }
    out.toString
  }

  /** Parse one PDF literal string starting at `start` (the '('); returns
    * (unescaped text, index after the closing paren). Handles nested
    * parens, backslash escapes and octal codes per the PDF spec.
    */
  private def parseString(s: String, start: Int): (String, Int) = {
    val out = new StringBuilder
    var depth = 1
    var i = start + 1
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case 't' => out.append('\t'); i += 2
          case 'b' => out.append('\b'); i += 2
          case 'f' => out.append('\f'); i += 2
          case '(' => out.append('('); i += 2
          case ')' => out.append(')'); i += 2
          case '\\' => out.append('\\'); i += 2
          case '\n' => i += 2 // line continuation
          case d if d >= '0' && d <= '7' =>
            var j = i + 1
            var v = 0
            while (j < s.length && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); j += 1
            }
            out.append(v.toChar); i = j
          case other => out.append(other); i += 2
        }
      } else if (c == '\r') {
        // spec 7.3.4.2: an EOL marker (CR, LF, or CRLF) inside a
        // literal string is read as ONE 0x0A — conformant readers of
        // our own archives must agree with us (review finding r15)
        out.append('\n')
        i += (if (i + 1 < s.length && s.charAt(i + 1) == '\n') 2 else 1)
      } else if (c == '(') { depth += 1; out.append(c); i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) out.append(c)
        i += 1
      } else { out.append(c); i += 1 }
    }
    (out.toString, i)
  }
}
