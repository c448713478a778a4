package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** S6 — real image payload decoding, pure JDK (`javax.imageio`). The
  * reference's image path feeds bytes to a vision model
  * (text_extraction.py:108-122); the model call stays behind the
  * deterministic provider seam (P8), but the PAYLOAD handling is real
  * here: actual PNG encode/decode, so width/height/format/pixels come
  * out of a genuine codec, not metadata arithmetic (contrast
  * [[graft.multimodal.StubMediaDecoder]], which remains the
  * DuckDB-mirrorable fast path).
  */
final case class ImageMeta(format: String, width: Int, height: Int, topLeftGray: Int)

object ImageCodec extends Serializable {

  // ImageIO's default stream cache is DISK-backed: every encode/decode
  // call allocates a FileCache stream that writes the image bytes to a
  // temp FILE under java.io.tmpdir before returning them (r20
  // optimization round, guide §1.2 "per-task work"). For the KB-sized
  // in-memory rasters every caller here round-trips, that is a file
  // create+write+delete per ROW in the hot kernels (phash, gray-hist,
  // OCR, s6/p7/p8). Memory-cached streams are semantically identical —
  // the codec bytes are byte-for-byte the same — so this is a pure
  // constant-factor win with no oracle impact.
  ImageIO.setUseCache(false)

  /** One uniform-gray raster, encoded by the named ImageIO writer —
    * the shared body behind the PNG and JPEG rungs (one construction,
    * two codecs; only the container format differs).
    */
  private def writeUniform(format: String, width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = gray & 0xff
    val rgb = (g << 16) | (g << 8) | g
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Encode a real single-color grayscale PNG of the given size. */
  def writePng(width: Int, height: Int, gray: Int): Array[Byte] =
    writeUniform("png", width, height, gray)

  /** Encode a real single-color grayscale JPEG (VERDICT r14 ask #5 —
    * the second real codec rung; the reference accepts arbitrary drive
    * images via MIME sniff, decision_agent.py:163-174 /
    * text_extraction.py:109-122, so one lossless and one lossy format
    * exercise the dispatch). Same `javax.imageio` path as PNG; the
    * registered reader names the format "JPEG", which [[decode]]
    * lowercases — that is how the two rungs stay distinguishable in the
    * `format` column.
    *
    * LOSSY-ROUNDTRIP CONTRACT: JPEG does not promise byte-exact pixels.
    * For the UNIFORM rasters this writer produces, every 8×8 block is
    * DC-only and the JDK encoder's default-quality DC quantization
    * round-trips the gray level EXACTLY (measured: max |decoded −
    * written| = 0 over all 256 levels × three sizes) — but callers must
    * treat the decoded raster as approximate: the oracled query
    * projects a ±3 tolerance flag for JPEG rows, never the exact level.
    */
  def writeJpeg(width: Int, height: Int, gray: Int): Array[Byte] =
    writeUniform("jpg", width, height, gray)

  /** Encode a real grayscale gradient PNG: pixel (x,y) has gray level
    * `(base + x + y) % 256`. Unlike the uniform [[writePng]], every
    * pixel is distinct-ish, so resize/feature operators downstream are
    * verified against actual raster content, not just dimensions.
    */
  def writeGradientPng(width: Int, height: Int, base: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = (base + x + y) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Encode an in-memory raster as PNG bytes. */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Nearest-neighbor resize: destination pixel (x,y) samples source
    * pixel (x*srcW/dstW, y*srcH/dstH) (floor — the standard NN mapping,
    * integer arithmetic so an external oracle can replay any sampled
    * pixel exactly). Pure per-row compute: at scale this runs inside one
    * narrow map stage, no shuffle.
    */
  def resizeNearest(src: BufferedImage, dstW: Int, dstH: Int): BufferedImage = {
    val out = new BufferedImage(dstW, dstH, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < dstH) {
      val sy = y * src.getHeight / dstH
      var x = 0
      while (x < dstW) {
        out.setRGB(x, y, src.getRGB(x * src.getWidth / dstW, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode to the full raster (None on unrecognized/corrupt bytes —
    * same row-local degradation contract as [[decode]]).
    */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        reader.setInput(iis)
        Some(reader.read(0))
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[image-codec] decodeImage degraded to sentinel: ${e.getClass.getName}: ${e.getMessage}")
        None
    } finally iis.close()
  }

  /** Decode real image bytes: format from the registered reader, size
    * and the (0,0) gray level from the decoded raster.
    *
    * Truncated/corrupt bytes of a RECOGNIZED format (reader matches but
    * `read` throws IIOException) degrade to the same "unknown" sentinel
    * as an unrecognized format: decode failures must stay row-local —
    * one bad upload cannot fail a whole ingest job (the reference
    * error-logs per file, text_extraction.py dispatch).
    */
  def decode(bytes: Array[Byte]): ImageMeta = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return ImageMeta("unknown", -1, -1, -1)
      val reader = readers.next()
      reader.setInput(iis)
      val fmt = reader.getFormatName.toLowerCase
      val img = reader.read(0)
      val px = img.getRGB(0, 0)
      ImageMeta(fmt, img.getWidth, img.getHeight, px & 0xff)
    } catch {
      // Decode failures must stay row-local — one bad upload cannot
      // fail a whole ingest job — and ImageIO's readers throw more than
      // IIOException on malformed bytes (index/negative-size errors on
      // fuzzed dimension fields, CMMException on corrupt ICC profiles).
      // So degrade on ANY non-fatal throwable, but log its class first:
      // a genuine codec bug stays visible in the executor log instead
      // of silently becoming the "unknown" sentinel.
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[image-codec] decode degraded to sentinel: ${e.getClass.getName}: ${e.getMessage}")
        ImageMeta("unknown", -1, -1, -1)
    } finally iis.close()
  }
}
