package graft.multimodal

import graft.sources.ImageCodec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the real-codec resize/feature semantics the mm_resize /
  * mm_gray_hist oracles replay arithmetically: nearest-neighbor source
  * mapping `src = dst * srcDim / dstDim` (floor) and the gradient pixel
  * law `(base + x + y) % 256`, both through genuine PNG encode/decode.
  */
class ResizeFeatureSpec extends AnyFunSuite {

  test("gradient PNG round-trips pixel-exact") {
    val img = ImageCodec.decodeImage(ImageCodec.writeGradientPng(5, 3, 250)).get
    assert(img.getWidth == 5 && img.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 5)
      assert((img.getRGB(x, y) & 0xff) == (250 + x + y) % 256,
        s"pixel ($x,$y)")
  }

  test("nearest-neighbor downscale samples the floor-mapped source pixel") {
    // 4x2 gradient base 10 -> 2x1: dst (x,0) samples src (x*4/2, 0*2/1)
    // = (2x, 0), so pixels are (10+0+0)=10 and (10+2+0)=12.
    val src = ImageCodec.decodeImage(ImageCodec.writeGradientPng(4, 2, 10)).get
    val out = ImageCodec.resizeNearest(src, 2, 1)
    assert((out.getRGB(0, 0) & 0xff) == 10)
    assert((out.getRGB(1, 0) & 0xff) == 12)
  }

  test("nearest-neighbor upscale replicates source pixels") {
    // 2x2 gradient base 0 -> 4x4: dst (x,y) samples src (x/2, y/2).
    val src = ImageCodec.decodeImage(ImageCodec.writeGradientPng(2, 2, 0)).get
    val out = ImageCodec.resizeNearest(src, 4, 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert((out.getRGB(x, y) & 0xff) == (x / 2 + y / 2) % 256,
        s"pixel ($x,$y)")
  }

  test("resized corner pixels survive a PNG re-encode round-trip") {
    // The exact lineage mm_resize runs: gradient -> resize -> encode ->
    // decode; corners must equal the integer NN replay.
    val (w, h, g) = (23, 9, 200)
    val m = math.max(w, h)
    val (rw, rh) = (math.max(1, w * 16 / m), math.max(1, h * 16 / m))
    val back = ImageCodec.decodeImage(ImageCodec.encodePng(
      ImageCodec.resizeNearest(
        ImageCodec.decodeImage(ImageCodec.writeGradientPng(w, h, g)).get, rw, rh))).get
    assert(back.getWidth == rw && back.getHeight == rh)
    assert((back.getRGB(0, 0) & 0xff) == g % 256)
    val sx = (rw - 1) * w / rw
    val sy = (rh - 1) * h / rh
    assert((back.getRGB(rw - 1, rh - 1) & 0xff) == (g + sx + sy) % 256)
  }

  test("gray histogram counts the gradient law over the decoded raster") {
    // 3x2 base 60: pixels 60,61,62 / 61,62,63 -> bucket 1 (32..63) gets
    // all 6; mean = (60+61+62+61+62+63)/6.
    val img = ImageCodec.decodeImage(ImageCodec.writeGradientPng(3, 2, 60)).get
    val hist = new Array[Long](8)
    var sum = 0L
    for (y <- 0 until 2; x <- 0 until 3) {
      val gr = img.getRGB(x, y) & 0xff
      hist(gr / 32) += 1
      sum += gr
    }
    assert(hist.toSeq == Seq(0L, 6L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(sum == 369L)
  }

  test("wrap-around gradient spills into bucket 0") {
    // base 254, 3x1: pixels 254, 255, 0 -> buckets 7,7,0.
    val img = ImageCodec.decodeImage(ImageCodec.writeGradientPng(3, 1, 254)).get
    val buckets = (0 until 3).map(x => (img.getRGB(x, 0) & 0xff) / 32)
    assert(buckets == Seq(7, 7, 0))
  }
}
