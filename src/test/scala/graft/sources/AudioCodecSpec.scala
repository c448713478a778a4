package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** RIFF/PCM16 codec: byte-exact roundtrip, spec-required chunk
  * walking (unknown chunks skipped by size, odd sizes padded), and
  * loud rejection of everything the decoder does not claim to handle.
  */
class AudioCodecSpec extends AnyFunSuite {

  test("write -> decode roundtrip is sample-exact") {
    val samples = Array[Short](0, 100, -100, Short.MaxValue, Short.MinValue, 7)
    val Some((sr, back)) = AudioCodec.decodeWav(AudioCodec.writeWav(samples, 16000))
    assert(sr === 16000)
    assert(back.toSeq === samples.toSeq)
  }

  test("sawtooth fixture: exact integers, pads, first sample = -a") {
    val s = AudioCodec.sawtooth(n = 10, p = 5, a = 1000, pad = 3, trail = 2)
    assert(s.length === 15)
    assert(s.take(3).forall(_ == 0) && s.takeRight(2).forall(_ == 0))
    assert(s(3) === -1000) // phase 0
    assert(s(7) === 1000) // phase 4 = p-1 -> +a
    assert(s(8) === -1000) // wraps
  }

  test("unknown chunks (e.g. LIST metadata) are skipped, including odd-size padding") {
    val samples = Array[Short](1, -2, 3)
    val base = AudioCodec.writeWav(samples, 8000)
    // splice a 5-byte (odd) junk chunk between fmt and data
    val junk = ByteBuffer.allocate(8 + 6).order(ByteOrder.LITTLE_ENDIAN)
    junk.put("JUNK".getBytes("US-ASCII")).putInt(5).put(Array[Byte](1, 2, 3, 4, 5, 0))
    val out = ByteBuffer.allocate(base.length + 14).order(ByteOrder.LITTLE_ENDIAN)
    out.put(base, 0, 36) // RIFF header + fmt chunk
    out.put(junk.array())
    out.put(base, 36, base.length - 36) // data chunk
    val Some((sr, back)) = AudioCodec.decodeWav(out.array())
    assert(sr === 8000 && back.toSeq === samples.toSeq)
  }

  test("malformed and unsupported streams are rejected, never thrown") {
    assert(AudioCodec.decodeWav(null).isEmpty)
    assert(AudioCodec.decodeWav(Array.fill[Byte](10)(1)).isEmpty)
    assert(AudioCodec.decodeWav(Array.fill[Byte](100)(0x42)).isEmpty)
    // valid container, wrong channel count: patch channels = 2
    val wav = AudioCodec.writeWav(Array[Short](1, 2), 8000)
    val stereo = wav.clone(); stereo(22) = 2
    assert(AudioCodec.decodeWav(stereo).isEmpty)
    // data chunk before fmt must be refused (decoder requires fmt first)
    val truncated = wav.clone().take(40) // data header without payload len
    assert(AudioCodec.decodeWav(truncated).isEmpty)
    // declared chunk size beyond the buffer
    val lying = wav.clone()
    val bb = ByteBuffer.wrap(lying).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, Int.MaxValue)
    assert(AudioCodec.decodeWav(lying).isEmpty)
  }
}
