package graft.sources

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 codec hardening: /Length-bounded PDF stream slicing (binary
  * payloads may contain the literal 'endstream'), truncated-deflate
  * skip, and row-local image decode failure.
  */
class CodecHardeningSpec extends AnyFunSuite {

  test("PDF stream containing the literal 'endstream' in its payload is sliced by /Length") {
    // The payload's PDF string contains the byte sequence 'endstream' —
    // the old literal scan cut the stream mid-string and emitted
    // partial text; /Length slicing must recover the whole string.
    val payload = "BT (text with endstream inside) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      s"1 0 obj << /Length ${payload.length} >> stream\n" + payload + "\nendstream endobj\n" +
      "%%EOF").getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfCodec.extractText(pdf) == "text with endstream inside")
  }

  test("truncated FlateDecode stream is skipped, not emitted partially") {
    // deflate a page, then cut the compressed bytes short: Inflater
    // ends un-finished → the stream is skipped; the plain stream after
    // it (own dict, no /Filter) must still extract
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput("BT (page one intact) Tj ET".getBytes(StandardCharsets.ISO_8859_1))
      d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    }
    val cut = java.util.Arrays.copyOfRange(deflated, 0, deflated.length - 4)
    val good = "BT (page two intact) Tj ET"
    val pdf = new java.io.ByteArrayOutputStream()
    def raw(x: String): Unit = pdf.write(x.getBytes(StandardCharsets.ISO_8859_1))
    raw("%PDF-1.4\n")
    raw(s"1 0 obj << /Length ${cut.length} /Filter /FlateDecode >> stream\n")
    pdf.write(cut)
    raw("\nendstream endobj\n")
    raw(s"2 0 obj << /Length ${good.length} >> stream\n" + good + "\nendstream endobj\n%%EOF")
    assert(PdfCodec.extractText(pdf.toByteArray) == "page two intact")
  }

  test("indirect /Length (N 0 R) is not treated as a byte count") {
    // `/Length 5 0 R` points at another object; slicing 5 bytes would
    // truncate the text — the extractor must fall back to the scan
    val payload = "BT (indirect length text) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Length 5 0 R >> stream\n" + payload + "\nendstream endobj\n%%EOF")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfCodec.extractText(pdf) == "indirect length text")
  }

  test("multi-digit indirect /Length (12 0 R) is not backtracked into a bogus count") {
    // An unanchored \d{1,18} backtracks '12' down to '1' until the
    // indirect-ref lookahead stops matching, extracting length=1. The
    // payload here is 8 bytes, so 'endstream' sits within the 8-byte
    // sanity slack of the bogus 1-byte slice — only the (?!\d) anchor
    // in LengthRe saves the text. ('/Length 5 0 R' above passes even
    // without the anchor; this case is the real guard.)
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Length 12 0 R >> stream\nBT(ab)Tj\nendstream endobj\n%%EOF")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfCodec.extractText(pdf) == "ab")
  }

  test("declared /Length that does not land on endstream falls back to the scan") {
    val payload = "BT (mis-declared) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Length 3 >> stream\n" + payload + "\nendstream endobj\n%%EOF")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfCodec.extractText(pdf) == "mis-declared")
  }

  test("round-trip still exact with /Length slicing") {
    val text = Seq("first page with (parens) and \\ escapes", "second\npage")
    assert(PdfCodec.extractText(PdfCodec.write(text)) ==
      "first page with (parens) and \\ escapes\n\nsecond\npage")
  }

  test("corrupt bytes of a recognized image format degrade to the unknown sentinel") {
    val png = ImageCodec.writePng(16, 16, 99)
    val truncated = java.util.Arrays.copyOfRange(png, 0, 40) // header recognized, data gone
    assert(ImageCodec.decode(truncated) == ImageMeta("unknown", -1, -1, -1))
  }
}
