package graft.operators

import graft.TestSpark
import graft.functions.GzipKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The gzip leg (q337): the one codec the JDK ships WHOLE, so the spec
  * pins the halves the SQL oracle cannot see — real-consumer parity
  * (the JDK's own `GZIPInputStream` must decode our hand-headered
  * members byte-for-byte), the optional-field walk (FEXTRA / FCOMMENT /
  * FHCRC — q337 only plants FNAME), and the degrade taxonomy. */
class GzipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("round trip: explicit header fields parse back; JDK GZIPInputStream parity") {
    val payload = "the quick brown fox".getBytes("UTF-8")
    val bytes = GzipKernel.gzip(payload, mtime = 123456L, xfl = 2, os = 3, fname = "a.txt")
    // [is_gzip, mtime, xfl, os, has_name, isize, crc_ok, n_decoded]
    assert(GzipKernel.info(bytes).toSeq ==
      Seq(1L, 123456L, 2L, 3L, 1L, payload.length.toLong, 1L, payload.length.toLong))
    // the JDK's own reader accepts the member and reproduces the bytes
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    assert(in.readAllBytes().toSeq == payload.toSeq)
    // empty payload is a valid zero-length member
    val empty = GzipKernel.gzip(Array.empty, 0L, 0, 255, null)
    assert(GzipKernel.info(empty).toSeq == Seq(1L, 0L, 0L, 255L, 0L, 0L, 1L, 0L))
  }

  test("optional-field walk: FEXTRA, FCOMMENT, FHCRC skip structurally") {
    val base = GzipKernel.gzip("abc".getBytes, 7L, 0, 3, null)
    val deflatePlusTrailer = base.drop(10)
    // rebuild with FEXTRA(4) + FCOMMENT + FHCRC flags and fields
    val head = new java.io.ByteArrayOutputStream()
    head.write(Array[Byte](0x1f.toByte, 0x8b.toByte, 8, (0x04 | 0x10 | 0x02).toByte,
      7, 0, 0, 0, 0, 3))
    head.write(Array[Byte](4, 0, 1, 2, 3, 4)) // XLEN=4 + 4 extra bytes
    head.write("hi".getBytes); head.write(0) // comment, NUL-terminated
    head.write(Array[Byte](0x55, 0x55)) // FHCRC (not verified, skipped)
    val mut = head.toByteArray ++ deflatePlusTrailer
    val got = GzipKernel.info(mut).toSeq
    assert(got(0) == 1L && got(4) == 0L && got(6) == 1L && got(7) == 3L)
  }

  test("degrade taxonomy: trailer tamper is flagged, stream damage and garbage fail") {
    val bytes = GzipKernel.gzip("hello hello hello".getBytes, 1L, 0, 255, null)
    // flipped CRC byte: inflate fine, crc_ok = 0 (the q337 plant)
    val crcFlip = bytes.clone(); crcFlip(bytes.length - 8) = (crcFlip(bytes.length - 8) ^ 0xff).toByte
    val a = GzipKernel.info(crcFlip).toSeq
    assert(a(0) == 1L && a(6) == 0L && a(7) == 17L)
    // flipped ISIZE byte: same taxonomy
    val szFlip = bytes.clone(); szFlip(bytes.length - 1) = (szFlip(bytes.length - 1) ^ 0x01).toByte
    assert(GzipKernel.info(szFlip).toSeq(6) == 0L)
    // damage INSIDE the deflate stream: either the inflate hard-fails OR
    // it produces wrong bytes that the CRC catches — what can never
    // happen is a clean (is_gzip = 1, crc_ok = 1) readout
    val mid = bytes.clone(); mid(12) = (mid(12) ^ 0x3f).toByte
    val m = GzipKernel.info(mid).toSeq
    assert(m.head == 0L || m(6) == 0L, s"stream damage slipped through: $m")
    // truncation and garbage degrade
    assert(GzipKernel.info(bytes.take(bytes.length - 3)).toSeq.head == 0L)
    assert(GzipKernel.info("NOTAGZIP".getBytes).toSeq.head == 0L)
    assert(GzipKernel.info(null).toSeq.head == 0L)
  }

  test("DataFrame chain: gzipDocuments -> gzipInfo round-trips the plants") {
    val ids = Seq(
      (1L, "alpha beta", 11L, 0, 3, Some("n1"), false),
      (2L, "gamma", 22L, 4, 255, None, true)
    ).toDF("media_id", "text", "mtime", "xfl", "os", "fname", "corrupt_crc")
    val got = Multimodal.gzipInfo(
        Multimodal.gzipDocuments(ids).select(col("media_id"), col("content")), "content")
      .orderBy("media_id").collect()
    assert(got(0).getBoolean(1) && got(0).getLong(2) == 11L &&
      got(0).getBoolean(5) && got(0).getLong(6) == 10L &&
      got(0).getBoolean(7) && got(0).getLong(8) == 10L)
    assert(got(1).getBoolean(1) && !got(1).getBoolean(5) &&
      !got(1).getBoolean(7) && got(1).getLong(8) == 5L)
  }
}
