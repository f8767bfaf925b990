package graft.operators

import graft.TestSpark
import graft.functions.Utf8Kernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The charset leg (q344): pins the strict-table edges the SQL oracle
  * cannot exercise — overlongs, surrogates, the U+10FFFF cap,
  * truncation, stray continuations, and the one-invalid-byte resync
  * rule — plus the JDK encoder as the round-trip witness. */
class Utf8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def u8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("clean text: JDK-encoded 1..4-byte code points count exactly") {
    // a, é(2B), 中(3B), 💖(4B = surrogate pair in the String)
    val s = "aé中💖"
    // [encoding, n_chars, n_invalid, n_multibyte, has_bom]
    assert(Utf8Kernel.info(u8(s)).toSeq == Seq(1L, 4L, 0L, 3L, 0L))
    assert(Utf8Kernel.info(Array.empty[Byte]).toSeq == Seq(1L, 0L, 0L, 0L, 0L))
    // UTF-8 BOM is consumed, not counted
    assert(Utf8Kernel.info(b(0xef, 0xbb, 0xbf) ++ u8("hi")).toSeq ==
      Seq(1L, 2L, 0L, 0L, 1L))
  }

  test("BOM sniff: UTF-16LE and UTF-16BE stop at the mark") {
    assert(Utf8Kernel.info(b(0xff, 0xfe, 0x68, 0x00)).toSeq ==
      Seq(2L, -1L, -1L, -1L, -1L))
    assert(Utf8Kernel.info(b(0xfe, 0xff, 0x00, 0x68)).toSeq ==
      Seq(3L, -1L, -1L, -1L, -1L))
  }

  test("strict table: overlongs, surrogates, cap, stray leads all rejected") {
    // C0 AF: overlong '/', both bytes invalid (C0 lead rejected, AF stray)
    assert(Utf8Kernel.info(b(0xc0, 0xaf)).toSeq == Seq(1L, 0L, 2L, 0L, 0L))
    // E0 80 80: overlong 3-byte — E0 requires A0..BF first continuation
    assert(Utf8Kernel.info(b(0xe0, 0x80, 0x80)).toSeq(2) == 3L)
    // ED A0 80: U+D800 surrogate — rejected
    assert(Utf8Kernel.info(b(0xed, 0xa0, 0x80)).toSeq(2) == 3L)
    // ED 9F BF: U+D7FF — the last code point BEFORE the surrogates, valid
    assert(Utf8Kernel.info(b(0xed, 0x9f, 0xbf)).toSeq == Seq(1L, 1L, 0L, 1L, 0L))
    // F4 90 80 80: U+110000, over the cap
    assert(Utf8Kernel.info(b(0xf4, 0x90, 0x80, 0x80)).toSeq(2) == 4L)
    // F4 8F BF BF: U+10FFFF exactly, valid
    assert(Utf8Kernel.info(b(0xf4, 0x8f, 0xbf, 0xbf)).toSeq == Seq(1L, 1L, 0L, 1L, 0L))
    // F5 and FF leads, stray continuation
    assert(Utf8Kernel.info(b(0xf5, 0x80)).toSeq(2) == 2L)
    assert(Utf8Kernel.info(b(0x80)).toSeq(2) == 1L)
  }

  test("resync: one bad byte costs one invalid, neighbors still count") {
    val bytes = u8("ab") ++ b(0xff) ++ u8("cé")
    assert(Utf8Kernel.info(bytes).toSeq == Seq(1L, 4L, 1L, 1L, 0L))
    // truncated 3-byte sequence at EOF: the lead is invalid, earlier chars keep
    assert(Utf8Kernel.info(u8("xy") ++ b(0xe4, 0xb8)).toSeq == Seq(1L, 2L, 2L, 0L, 0L))
    assert(Utf8Kernel.info(null).head == 0L)
  }

  test("DataFrame chain: encodedDocuments -> charsetInfo round-trips the plants") {
    val ids = Seq((1L, "one token"), (5L, "five"), (9L, "nine"), (11L, "eleven"),
      (43L, "fortythree"))
      .toDF("media_id", "text")
    val got = Multimodal.charsetInfo(
        Multimodal.encodedDocuments(ids).select(col("media_id"), col("content")),
        "content")
      .orderBy("media_id").collect()
    // (media_id, encoding, n_chars, n_invalid, n_multibyte, has_bom)
    // id 1: suffix é(1%4=1) ñ(1%3=1) 中(1%2=1): 9+3 chars, 3 multibyte
    assert(got(0).getString(1) == "utf8" && got(0).getLong(2) == 12L &&
      got(0).getLong(3) == 0L && got(0).getLong(4) == 3L && !got(0).getBoolean(5))
    // id 5: BOM; suffix é(1) ñ(2) 中(1): 4+4, bom true
    assert(got(1).getString(1) == "utf8" && got(1).getLong(2) == 8L &&
      got(1).getBoolean(5))
    // id 9: utf16le, counters null
    assert(got(2).getString(1) == "utf16le" && got(2).isNullAt(2))
    // id 11: junk 1+11%3=3 invalid bytes; suffix é(3) ñ(2) 中(1): 6+6 chars
    assert(got(3).getString(1) == "utf8" && got(3).getLong(2) == 12L &&
      got(3).getLong(3) == 3L && got(3).getLong(4) == 6L)
    // id 43: utf16be
    assert(got(4).getString(1) == "utf16be" && got(4).isNullAt(2))
  }
}
