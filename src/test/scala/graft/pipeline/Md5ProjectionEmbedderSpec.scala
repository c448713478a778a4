package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Pins the embedder's DuckDB contract (see its scaladoc): every
  * component is derived from md5 HEX slices by exact arithmetic, so an
  * independent hex-parsing re-derivation — the literal computation the
  * oracle SQL performs — must reproduce the floats bit-for-bit. If this
  * spec fails after an edit, every value-exact gate built on the
  * provider (flagship_lifecycle, relay_int8_topk) fails with it.
  */
class Md5ProjectionEmbedderSpec extends AnyFunSuite {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  test("components reproduce the oracle's hex-slice arithmetic bit-for-bit") {
    val dim = 64
    val e = new Md5ProjectionEmbedder(dim)
    for (t <- Seq("hello world", "a", "", "مرحبا 世界 mixed")) {
      val v = e.embed(Seq(t)).head
      assert(v.length == dim)
      // the oracle's path: uint32 from 8 hex chars of md5((j/4) + ":" + t)
      val xs = (0 until dim).map { j =>
        val hex = md5Hex(s"${j / 4}:$t")
        val h = java.lang.Long.parseLong(hex.substring((j % 4) * 8, (j % 4) * 8 + 8), 16)
        h / 2147483648.0 - 1.0
      }
      var ss = 0.0
      xs.foreach(x => ss += x * x) // sequential, like the embedder and list_reduce
      val n = math.sqrt(ss)
      (0 until dim).foreach { j =>
        assert(v(j) == (xs(j) / n).toFloat,
          s"component $j of '$t': ${v(j)} != ${(xs(j) / n).toFloat}")
      }
    }
  }

  test("unit norm, deterministic across instances, batch order preserved") {
    val a = new Md5ProjectionEmbedder(64)
    val b = new Md5ProjectionEmbedder(64)
    val texts = Seq("first doc", "second doc", "first doc")
    val va = a.embed(texts)
    val vb = b.embed(texts)
    assert(va.zip(vb).forall { case (x, y) => x.sameElements(y) },
      "two instances must agree")
    assert(va(0).sameElements(va(2)), "same text, same vector")
    assert(!va(0).sameElements(va(1)), "different texts, different vectors")
    va.foreach { v =>
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-6, s"unit norm, got $norm")
    }
  }

  test("null embeds like empty; dimension must be a multiple of 4") {
    val e = new Md5ProjectionEmbedder(8)
    assert(e.embed(Seq(null)).head.sameElements(e.embed(Seq("")).head))
    intercept[IllegalArgumentException](new Md5ProjectionEmbedder(10))
  }
}
