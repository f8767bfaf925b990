package graft.operators

import graft.TestSpark
import graft.functions.OggKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Ogg/Opus leg's two-part gate (q335's sibling): the CONTAINER —
  * page walk, CRC, OpusHead fields, granule-derived duration — is
  * oracle-gated cross-engine (q336); the PAYLOAD decode is
  * environment-blocked (no JDK Opus decoder) and pinned HERE as a dated
  * probe-in-code. */
class OggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def synthOne(mediaId: Long, ch: Int = 2, preSkip: Int = 312,
      pages: Int = 2, spp: Int = 960, corrupt: Boolean = false): Array[Byte] =
    Multimodal.syntheticOpusOggs(
      Seq((mediaId, ch, preSkip, pages, spp, corrupt))
        .toDF("media_id", "channels", "pre_skip", "n_audio_pages",
          "samples_per_page", "corrupt_crc"))
      .select("content").head.getAs[Array[Byte]](0)

  test("page walk: OpusHead fields, granules, exact 48 kHz duration") {
    val bytes = synthOne(5L, ch = 1, preSkip = 400, pages = 3, spp = 1920)
    // [is_ogg, is_opus, channels, pre_skip, n_pages, last_granule, duration_ms]
    assert(OggKernel.info(bytes).toSeq ==
      Seq(1L, 1L, 1L, 400L, 4L, 400L + 3 * 1920L, (3 * 1920L) * 1000 / 48000))
  }

  test("CRC covers the WHOLE page: any flipped byte drops that page and its granule") {
    val bytes = synthOne(7L, pages = 2)
    val clean = OggKernel.info(bytes).toSeq
    assert(clean(4) == 3L)
    // flip one byte in every region of the LAST page (header, granule,
    // segment table, payload) — the walk must stop before it each time
    val lastPageAt = bytes.length - 78 // 28 header + 50 payload
    for (off <- Seq(lastPageAt + 5, lastPageAt + 9, lastPageAt + 27, lastPageAt + 60)) {
      val mut = bytes.clone(); mut(off) = (mut(off) ^ 0x01).toByte
      val got = OggKernel.info(mut).toSeq
      assert(got(4) == 2L, s"flip at +${off - lastPageAt} not caught by CRC")
      assert(got(5) == clean(5).asInstanceOf[Long] - 960L, "granule must be the previous page's")
    }
    // ... and a flipped byte in the BOS page kills the stream entirely
    val mut0 = bytes.clone(); mut0(30) = (mut0(30) ^ 0x01).toByte
    assert(OggKernel.info(mut0).toSeq.head == 0L)
  }

  test("corrupt_crc plant: the walk stops, counts drop, duration clamps at 0 for a lone page") {
    val one = OggKernel.info(synthOne(9L, pages = 1, corrupt = true)).toSeq
    assert(one == Seq(1L, 1L, 2L, 312L, 1L, 0L, 0L),
      "lone corrupt audio page: BOS only, granule 0, duration clamped")
    val two = OggKernel.info(synthOne(9L, pages = 2, corrupt = true)).toSeq
    assert(two(4) == 2L && two(5) == 312L + 960L)
  }

  test("non-Opus Ogg parses as a container; garbage and truncation degrade") {
    // hand-build a CRC-valid BOS page with a non-Opus payload
    val payload = "vorbis-ish".getBytes("US-ASCII")
    val page = new Array[Byte](28 + payload.length)
    page(0) = 'O'; page(1) = 'g'; page(2) = 'g'; page(3) = 'S'
    page(5) = 0x02; page(26) = 1; page(27) = payload.length.toByte
    System.arraycopy(payload, 0, page, 28, payload.length)
    var c = OggKernel.pageCrc(page, 0, page.length, 22).toLong & 0xffffffffL
    (0 until 4).foreach { j => page(22 + j) = (c & 0xff).toByte; c >>>= 8 }
    val got = OggKernel.info(page).toSeq
    assert(got(0) == 1L && got(1) == 0L && got(2) == -1L && got(6) == -1L,
      "a valid non-Opus stream is Ogg but carries no Opus fields/duration")
    assert(OggKernel.info("NOTANOGG".getBytes("US-ASCII")).toSeq.head == 0L)
    assert(OggKernel.info(null).toSeq.head == 0L)
    val bytes = synthOne(3L)
    assert(OggKernel.info(bytes.take(40)).toSeq.head == 0L,
      "truncated mid-BOS must degrade (CRC cannot verify)")
  }

  test("payload decode is environment-blocked: the JDK ships no Opus/Ogg decoder (probed 2026-08-16)") {
    val bytes = synthOne(11L)
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
    }
  }
}
