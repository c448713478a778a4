package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002;
  * Beyer et al. 2007 "On synopses for distinct value estimation"): the
  * state is the K smallest DISTINCT 60-bit hash values seen, and the
  * estimator (K−1)·2^60 / h_K unbiasedly recovers the distinct count
  * with relative error ≈ 1/sqrt(K−2).
  *
  * Why this shape for a 100 TB engine: the state is a perfect monoid —
  * KMV(A ∪ B) = K smallest of (KMV(A) ∪ KMV(B)) exactly, because the K
  * smallest distinct values of a union are always contained in the
  * per-side K smallest. So partial aggregation is lossless (map-side
  * combine ships ≤K longs per group per partition), sketches of corpus
  * shards fold without re-reading the shards (the SourceSketch persistence
  * argument), and the result is partition-invariant — which is what lets
  * the estimate pass a cross-engine hash gate (SketchSpec pins both).
  *
  * The input is the hash, not the raw value: hashing (md5 prefix) is done
  * in codegen'd Column space so the aggregator stays a pure Long monoid.
  */
object KmvAggregator extends Aggregator[Long, Array[Long], Array[Long]] {
  val K = 64

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert keeping the buffer a sorted array of ≤K distinct values.
    * After warm-up most inputs exceed the current max and exit on the
    * cheap `h >= last` test, so the steady-state cost is one compare.
    */
  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val n = buf.length
    if (n == K && h >= buf(n - 1)) return buf
    val i = java.util.Arrays.binarySearch(buf, h)
    if (i >= 0) return buf // already present: distinct semantics
    val ins = -i - 1
    val out = new Array[Long](if (n < K) n + 1 else K)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, out.length - ins - 1)
    out
  }

  /** Sorted-merge dedup truncated to K — the monoid fold. */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(K, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i == a.length) { j += 1; b(j - 1) }
        else if (j == b.length) { i += 1; a(i - 1) }
        else if (a(i) < b(j)) { i += 1; a(i - 1) }
        else if (b(j) < a(i)) { j += 1; b(j - 1) }
        else { i += 1; j += 1; a(i - 1) } // equal: keep once
      if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
