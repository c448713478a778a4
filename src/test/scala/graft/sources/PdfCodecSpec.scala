package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** S3 over real bytes: valid-PDF writer (xref, FlateDecode) and the
  * pdfplumber-contract extractor (pages joined "\n\n",
  * text_extraction.py:64-75).
  */
class PdfCodecSpec extends AnyFunSuite {

  test("roundtrip: single page is identity (through real zlib)") {
    val t = "alpha beta gamma delta"
    val pdf = PdfCodec.write(Seq(t))
    assert(new String(pdf.take(8), "UTF-8").startsWith("%PDF-1.4"))
    assert(new String(pdf, "ISO-8859-1").contains("/FlateDecode"))
    assert(PdfCodec.extractText(pdf) == t)
  }

  test("multi-page join is \\n\\n and blank pages are dropped") {
    val got = PdfCodec.extractText(PdfCodec.write(Seq("page one", "   ", "page two")))
    assert(got == "page one\n\npage two")
  }

  test("pdf string escapes survive: parens, backslash, raw newline, unicode") {
    val t = "a (nested (deep)) b \\ c\nline2 café"
    assert(PdfCodec.extractText(PdfCodec.write(Seq(t))) == t)
  }

  test("foreign content stream: TJ array and octal escapes") {
    // hand-written uncompressed stream exercising operators our writer
    // never emits — [(A) -120 (B)] TJ with an octal escape
    val content = "BT [(Hel) -20 (lo \\050x\\051)] TJ ET"
    assert(PdfCodec.textShowOps(content) == "Hello (x)")
  }

  test("seeded fuzz: 300 random strings (parens/backslashes/newlines/unicode) round-trip") {
    val rnd = new scala.util.Random(42)
    // whole code points (picking chars would split the 𝄞 surrogate pair
    // into lone surrogates, which cannot survive UTF-8 by definition)
    val pool = Vector("a", "b", " ", "X", "Y", "0", "9", "(", ")", "\\", "\n", "\t", "é", "ü", "中", "𝄞")
    for (i <- 1 to 300) {
      val t = (0 until 1 + rnd.nextInt(120)).map(_ => pool(rnd.nextInt(pool.length))).mkString
      if (t.trim.nonEmpty)
        assert(PdfCodec.extractText(PdfCodec.write(Seq(t))) == t, s"fuzz case $i: ${t.take(40)}")
    }
  }

  test("garbage and truncated inputs extract to empty, not crash") {
    assert(PdfCodec.extractText("not a pdf at all".getBytes("UTF-8")) == "")
    assert(PdfCodec.extractText(Array[Byte]()) == "")
    val pdf = PdfCodec.write(Seq("some body text"))
    // cut mid content stream: the unterminated stream yields no pages
    assert(PdfCodec.extractText(pdf.take(pdf.length / 2)) == "")
  }

  test("xref offsets point at real object starts") {
    val pdf = PdfCodec.write(Seq("abc"))
    val s = new String(pdf, "ISO-8859-1")
    val xref = s.indexOf("xref\n0 ") // the table, not 'startxref'
    val lines = s.substring(xref).split("\n")
    // first real entry (object 1) — its offset must land on "1 0 obj"
    val off1 = lines(3).split(" ")(0).toInt
    assert(s.substring(off1).startsWith("1 0 obj"))
  }
}
