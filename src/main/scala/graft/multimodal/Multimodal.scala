package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column support (BASELINE.json north star): media is an
  * opaque `binary` column + typed metadata struct; decode / feature
  * extraction are partition-parallel stages over batches.
  *
  * The actual codec STUB: this container has no image/audio libraries,
  * so [[StubMediaDecoder]] derives deterministic fake metadata from the
  * bytes. The Spark-side plumbing — binary column handling, batch
  * iteration, schema, frame-sample generator — is real and oracle-tested;
  * swapping in a JNI/JavaCV decoder only replaces the trait impl.
  */
final case class MediaMeta(format: String, width: Int, height: Int, nFrames: Int)

trait MediaDecoder extends Serializable {
  def decode(bytes: Array[Byte]): MediaMeta
}

/** Deterministic stand-in decoder: metadata from md5 of the payload.
  * Matches the native-expression form in [[MultimodalOps.metaCols]]
  * (ascii-of-hex-digit arithmetic) so it is DuckDB-mirrorable.
  */
final class StubMediaDecoder extends MediaDecoder {
  def decode(bytes: Array[Byte]): MediaMeta = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    MediaMeta(
      format = (hex.charAt(2).toInt % 3) match {
        case 0 => "png"; case 1 => "jpeg"; case 2 => "webp"
      },
      width = 32 * (1 + hex.charAt(0).toInt % 8),
      height = 32 * (1 + hex.charAt(1).toInt % 8),
      nFrames = 1 + hex.charAt(3).toInt % 4)
  }
}

object MultimodalOps {

  /** Native-expression metadata columns over a binary column — the
    * codegen'd fast path equivalent of StubMediaDecoder.
    */
  def metaCols(blob: Column): Seq[Column] = {
    val hex = md5(blob)
    Seq(
      when(ascii(substring(hex, 3, 1)) % 3 === 0, "png")
        .when(ascii(substring(hex, 3, 1)) % 3 === 1, "jpeg")
        .otherwise("webp").as("format"),
      (lit(32) * (lit(1) + ascii(substring(hex, 1, 1)) % 8)).as("width"),
      (lit(32) * (lit(1) + ascii(substring(hex, 2, 1)) % 8)).as("height"),
      (lit(1) + ascii(substring(hex, 4, 1)) % 4).as("n_frames"))
  }

  /** Decode via the trait (mapPartitions-style batched UDF path) — used
    * when the decoder is a real codec that cannot be an expression.
    */
  def decodeStage(df: DataFrame, blobCol: String, decoder: MediaDecoder): DataFrame = {
    val decodeUdf = udf { (bytes: Array[Byte]) =>
      val m = decoder.decode(bytes)
      (m.format, m.width, m.height, m.nFrames)
    }
    df.withColumn("media_meta", decodeUdf(col(blobCol)))
      .withColumn("format", col("media_meta._1"))
      .withColumn("width", col("media_meta._2"))
      .withColumn("height", col("media_meta._3"))
      .withColumn("n_frames", col("media_meta._4"))
      .drop("media_meta")
  }

  /** Frame-sample generator: one row per sampled frame index. */
  def frameSample(df: DataFrame, nFramesCol: String = "n_frames"): DataFrame =
    df.select(col("*"),
      posexplode(sequence(lit(0), col(nFramesCol) - 1)).as(Seq("frame_pos", "frame_idx")))
      .drop("frame_pos")
}
