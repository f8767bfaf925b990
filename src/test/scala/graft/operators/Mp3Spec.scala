package graft.operators

import graft.TestSpark
import graft.functions.Mp3Kernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The MP3 leg's two-part gate (r16 verdict #2, the q334 JPEG mold on
  * audio): the CONTAINER — sync, tables, frame walk, duration — is
  * oracle-gated cross-engine (q335); the PAYLOAD decode is
  * environment-blocked (the JDK ships no MP3 decoder) and that block is
  * pinned HERE as a dated probe-in-code instead of a prose note. */
class Mp3Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** One hand-built Layer III frame (header + filler to the formula size). */
  private def frame(verBits: Int, bIdx: Int, rIdx: Int, pad: Int = 0,
      mode: Int = 0): Array[Byte] = {
    val b2 = 0xe0 | (verBits << 3) | (1 << 1) | 1
    val b3 = (bIdx << 4) | (rIdx << 2) | (pad << 1)
    val b4 = mode << 6
    val ver = if (verBits == 3) 1 else if (verBits == 2) 2 else 25
    val fb = Mp3Kernel.frameBytes(ver, bIdx, rIdx, pad)
    val out = new Array[Byte](fb)
    out(0) = 0xff.toByte; out(1) = b2.toByte; out(2) = b3.toByte; out(3) = b4.toByte
    out
  }

  test("frame walk: MPEG1 Layer III fields, VBR, padding, frame counting") {
    // one 128 kbps / 44100 Hz stereo frame: 144*128000/44100 = 417 bytes
    val f1 = frame(3, 9, 0)
    assert(f1.length == 417)
    assert(Mp3Kernel.info(f1).toSeq ==
      Seq(1L, 1L, 44100L, 128L, 2L, 1L, 1152L * 1000 / 44100))
    // three frames: duration is the exact floor of total samples
    assert(Mp3Kernel.info(f1 ++ f1 ++ f1).toSeq ==
      Seq(1L, 1L, 44100L, 128L, 2L, 3L, 3L * 1152 * 1000 / 44100))
    // VBR: a second frame at a different bitrate walks fine; the reported
    // bitrate is the FIRST frame's
    val f2 = frame(3, 14, 0) // 320 kbps
    assert(Mp3Kernel.info(f1 ++ f2).toSeq ==
      Seq(1L, 1L, 44100L, 128L, 2L, 2L, 2L * 1152 * 1000 / 44100))
    // padding bit adds exactly one byte to the step
    val fp = frame(3, 9, 0, pad = 1)
    assert(fp.length == 418)
    assert(Mp3Kernel.info(fp ++ f1).toSeq(5) == 2L)
    // mono mode bits
    assert(Mp3Kernel.info(frame(3, 9, 0, mode = 3)).toSeq(4) == 1L)
  }

  test("frame walk: MPEG2 and MPEG2.5 tables (576 samples/frame)") {
    // MPEG2: 64 kbps idx 8, 24000 Hz idx 1 -> 72*64000/24000 = 192 bytes
    val f2 = frame(2, 8, 1)
    assert(f2.length == 192)
    assert(Mp3Kernel.info(f2).toSeq ==
      Seq(1L, 2L, 24000L, 64L, 2L, 1L, 576L * 1000 / 24000))
    // MPEG2.5: verBits 00, 8000 Hz idx 2
    val f25 = frame(0, 1, 2) // 8 kbps, 72*8000/8000 = 72 bytes
    assert(Mp3Kernel.info(f25).toSeq ==
      Seq(1L, 25L, 8000L, 8L, 2L, 1L, 576L * 1000 / 8000))
  }

  test("ID3v2 prefix skipped; garbage, truncation, reserved fields degrade") {
    val f1 = frame(3, 9, 0)
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 17) ++
      Array.fill[Byte](17)('x')
    assert(Mp3Kernel.info(id3 ++ f1).toSeq(5) == 1L, "ID3v2 tag must be skipped")
    // a truncated tail frame does not count
    assert(Mp3Kernel.info(f1 ++ f1.take(100)).toSeq(5) == 1L)
    // mid-stream samplerate change stops the walk (no real file does this)
    assert(Mp3Kernel.info(f1 ++ frame(3, 9, 1)).toSeq(5) == 1L)
    // garbage / null / short / free-format / bad index / reserved rate or
    // version / non-Layer-III all degrade, never throw
    assert(Mp3Kernel.info("NOTANMP3".getBytes("US-ASCII")).toSeq.head == 0L)
    assert(Mp3Kernel.info(null).toSeq.head == 0L)
    assert(Mp3Kernel.info(Array[Byte](0xff.toByte)).toSeq.head == 0L)
    def bad(b2: Int, b3: Int) =
      Mp3Kernel.info(Array(0xff.toByte, b2.toByte, b3.toByte, 0.toByte) ++
        Array.fill[Byte](500)(0)).toSeq.head
    assert(bad(0xfb, 0x00 << 4 | 0) == 0L, "free-format bitrate rejected")
    assert(bad(0xfb, 0x0f << 4 | 0) == 0L, "bad bitrate index rejected")
    assert(bad(0xfb, 9 << 4 | (3 << 2)) == 0L, "reserved samplerate rejected")
    assert(bad(0xeb, 9 << 4 | 0) == 0L, "reserved version rejected")
    assert(bad(0xfd, 9 << 4 | 0) == 0L, "Layer II is not the MP3 contract")
  }

  test("syntheticMp3s round-trips through mp3Info (the q335 chain, one partition)") {
    val ids = Seq(
      (10L, 1, 9, 0, 3, false, true),
      (11L, 2, 5, 1, 2, true, false)
    ).toDF("media_id", "version", "bitrate_idx", "rate_idx", "n_frames",
      "with_id3", "mono")
    val got = Multimodal.mp3Info(
        Multimodal.syntheticMp3s(ids).select(col("media_id"), col("content")), "content")
      .orderBy("media_id").collect()
    assert(got(0).getBoolean(1) && got(0).getLong(2) == 1L &&
      got(0).getLong(3) == 44100L && got(0).getLong(4) == 128L &&
      got(0).getLong(5) == 1L && got(0).getLong(6) == 3L)
    assert(got(1).getBoolean(1) && got(1).getLong(2) == 2L &&
      got(1).getLong(3) == 24000L && got(1).getLong(4) == 40L &&
      got(1).getLong(5) == 2L && got(1).getLong(6) == 2L &&
      got(1).getLong(7) == 2L * 576 * 1000 / 24000)
  }

  test("payload decode is environment-blocked: the JDK ships no MP3 decoder (probed 2026-08-16)") {
    // javax.sound.sampled supports WAV/AIFF/AU only — an MP3 stream must
    // be REJECTED by AudioSystem. If a JDK/environment ever adds an MP3
    // SPI, this fails loudly and the decode leg graduates from
    // env-blocked to implementable (SURVEY §8.3 carries the dated note).
    val bytes = frame(3, 9, 0) ++ frame(3, 9, 0)
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
    }
  }
}
