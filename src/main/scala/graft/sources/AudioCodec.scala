package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JDK WAV (RIFF PCM16 mono) codec — the audio sibling of
  * [[ImageCodec]]: the container has no media libraries, so the REAL
  * byte-level codec path is what the engine ships (write → parse →
  * samples), and the multimodal audio queries run their features over
  * DECODED samples so any codec deviation breaks the oracle, not just
  * the arithmetic.
  *
  * Layout written/accepted: RIFF header, `fmt ` chunk (PCM, 1 channel,
  * 16-bit), then chunks walked in order until `data` (unknown chunks —
  * e.g. LIST metadata — are skipped by their declared size, as the
  * spec requires). Little-endian throughout.
  */
object AudioCodec {

  /** Encode mono PCM16 samples as a WAV byte array. */
  def writeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a WAV byte array to (sampleRate, samples). None on anything
    * that is not a well-formed RIFF/WAVE PCM16-mono stream.
    */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes == null || bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    try {
      if (tag() != "RIFF") return None
      buf.getInt // riff size (trust the chunk walk, not this)
      if (tag() != "WAVE") return None
      var sampleRate = -1
      var ok = false
      // walk chunks; fmt must precede data per spec
      while (buf.remaining() >= 8) {
        val id = tag()
        val size = buf.getInt
        if (size < 0 || size > buf.remaining()) return None
        id match {
          case "fmt " =>
            if (size < 16) return None
            val start = buf.position()
            val fmt = buf.getShort
            val channels = buf.getShort
            sampleRate = buf.getInt
            buf.getInt; buf.getShort
            val bits = buf.getShort
            if (fmt != 1 || channels != 1 || bits != 16) return None
            buf.position(start + size + (size & 1)) // chunks pad to even
            ok = true
          case "data" =>
            if (!ok || sampleRate <= 0) return None
            val n = size / 2
            val out = new Array[Short](n)
            var i = 0
            while (i < n) { out(i) = buf.getShort; i += 1 }
            return Some((sampleRate, out))
          case _ =>
            buf.position(buf.position() + size + (size & 1))
        }
      }
      None
    } catch { case _: Exception => None }
  }

  /** Deterministic integer sawtooth test waveform (the audio analog of
    * [[ImageCodec.writeGradientPng]]'s gradient): `pad` leading and
    * `trail` trailing zero samples around `n` sawtooth samples of
    * period `p` and amplitude `a` — every sample an exact integer
    * (`-a + (2a·phase) div (p-1)`), so features over the decoded
    * signal replay arithmetically in any engine.
    */
  def sawtooth(n: Int, p: Int, a: Int, pad: Int, trail: Int): Array[Short] = {
    require(p >= 2 && a > 0 && a <= Short.MaxValue, s"sawtooth: bad p=$p a=$a")
    // negatives would AIOOBE mid-loop (review finding r15) — be loud here
    require(n >= 0 && pad >= 0 && trail >= 0,
      s"sawtooth: negative lengths n=$n pad=$pad trail=$trail")
    val out = new Array[Short](pad + n + trail)
    var i = 0
    while (i < n) {
      val phase = i % p
      out(pad + i) = (-a + (2L * a * phase) / (p - 1)).toShort
      i += 1
    }
    out
  }
}
