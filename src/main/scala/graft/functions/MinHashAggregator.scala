package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF form of the 16-permutation MinHash signature (SURVEY.md
  * §2.10 — the `Aggregator[IN,BUF,OUT]` surface): aggregates exploded
  * shingles into the per-group signature with map-side partial merge
  * (each partition keeps only 16 hex strings, merge is elementwise min).
  *
  * Functionally identical to the fused per-row UDF used by
  * `dedup_minhash_lsh` (asserted in MinHashAggregatorSpec); the UDAF
  * form is the right tool when shingles arrive ALREADY exploded — e.g.
  * out of a shingle inverted index — and re-assembling arrays per doc
  * would cost a shuffle anyway.
  */
object MinHashAggregator extends Aggregator[String, Array[String], Seq[String]] {
  private val NumPerms = 16
  private val hexDigits = "0123456789abcdef"

  private def md5Hex(s: String): String = {
    val bytes = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < bytes.length) {
      sb.append(hexDigits.charAt((bytes(i) >> 4) & 0xf))
      sb.append(hexDigits.charAt(bytes(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  override def zero: Array[String] = Array.fill(NumPerms)(null)

  override def reduce(buf: Array[String], shingle: String): Array[String] = {
    var p = 0
    while (p < NumPerms) {
      val h = md5Hex(s"$p:$shingle")
      if (buf(p) == null || h.compareTo(buf(p)) < 0) buf(p) = h
      p += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var p = 0
    while (p < NumPerms) {
      if (a(p) == null || (b(p) != null && b(p).compareTo(a(p)) < 0)) a(p) = b(p)
      p += 1
    }
    a
  }

  override def finish(buf: Array[String]): Seq[String] =
    buf.toSeq.map(m => if (m == null) "" else m)

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
