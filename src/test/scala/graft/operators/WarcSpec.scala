package graft.operators

import graft.TestSpark
import graft.functions.{GzipKernel, WarcKernel}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The WARC shard leg (q338): pins the halves the SQL oracle cannot see —
  * real-consumer parity (the JDK's `GZIPInputStream` natively reads
  * concatenated members, so it must reproduce the concatenated record
  * bytes of our shards), the record-frame edge cases (Content-Length
  * mismatch, missing headers, a member holding a non-record), and the
  * degrade taxonomy at the member-walk level. */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def member(payload: Array[Byte]): Array[Byte] =
    GzipKernel.gzip(payload, mtime = 0L, xfl = 0, os = 255, fname = null)

  private def shard(records: Array[Byte]*): Array[Byte] =
    records.map(member).reduce(_ ++ _)

  test("walk: three-type shard counts members, records, types, HTTP status, lengths") {
    val resp = WarcKernel.record("response", "<urn:uuid:1-0>",
      "2026-08-16T00:00:00Z", "http://example.com/1/0",
      "HTTP/1.1 200 OK\r\n\r\nbody!".getBytes("US-ASCII"))
    val req = WarcKernel.record("request", "<urn:uuid:1-1>",
      "2026-08-16T00:00:00Z", "http://example.com/1/1",
      "GET / HTTP/1.1".getBytes("US-ASCII"))
    val meta = WarcKernel.record("metadata", "<urn:uuid:1-2>",
      "2026-08-16T00:00:00Z", null, "k: v".getBytes("US-ASCII"))
    // [is_warc, n_members, n_records, n_response, n_request, n_metadata,
    //  n_http_ok, content_total, n_crc_bad]
    assert(WarcKernel.info(shard(resp, req, meta)).toSeq ==
      Seq(1L, 3L, 3L, 1L, 1L, 1L, 1L, (24 + 14 + 4).toLong, 0L))
    // 404 responses count as records but not http-ok
    val notFound = WarcKernel.record("response", "<urn:uuid:2-0>",
      "2026-08-16T00:00:00Z", "http://example.com/2/0",
      "HTTP/1.1 404 Not Found\r\n\r\n".getBytes("US-ASCII"))
    assert(WarcKernel.info(shard(notFound)).toSeq ==
      Seq(1L, 1L, 1L, 1L, 0L, 0L, 0L, 26L, 0L))
  }

  test("http-ok breadth (r17 advice): HTTP/1.0 and any 2xx count; 3xx/junk do not") {
    def resp(status: String) = WarcKernel.record("response", "<urn:uuid:2-1>",
      "2026-08-16T00:00:00Z", "http://example.com/2/1",
      (status + "\r\n\r\nbody").getBytes("US-ASCII"))
    def okFlag(status: String): Long = WarcKernel.info(shard(resp(status)))(6)
    assert(okFlag("HTTP/1.0 200 OK") == 1L)
    assert(okFlag("HTTP/1.1 206 Partial Content") == 1L)
    assert(okFlag("HTTP/1.0 204 No Content") == 1L)
    assert(okFlag("HTTP/1.1 301 Moved Permanently") == 0L)
    assert(okFlag("HTTP/1.1 404 Not Found") == 0L)
    assert(okFlag("HTTP/2 200") == 0L) // not a 1.x status line
    assert(okFlag("HTTP/1.1 2000") == 0L) // 4-digit junk is not a 2xx
  }

  test("JDK GZIPInputStream parity: the shard is a valid multi-member stream") {
    val r0 = WarcKernel.record("metadata", "<urn:uuid:3-0>",
      "2026-08-16T00:00:00Z", null, "aa".getBytes("US-ASCII"))
    val r1 = WarcKernel.record("metadata", "<urn:uuid:3-1>",
      "2026-08-16T00:00:00Z", null, "bb".getBytes("US-ASCII"))
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(shard(r0, r1)))
    // the JDK reader concatenates successive members' payloads
    assert(in.readAllBytes().toSeq == (r0 ++ r1).toSeq)
  }

  test("record-frame edges: bad version, bad Content-Length frame, non-record member") {
    val good = WarcKernel.record("metadata", "<urn:uuid:4-0>",
      "2026-08-16T00:00:00Z", null, "zz".getBytes("US-ASCII"))
    // a member that inflates to a non-record counts in n_members only;
    // is_warc holds because another member carries a valid record
    val s = shard(good, "just some text, no WARC here\r\n\r\n".getBytes("US-ASCII"))
    assert(WarcKernel.info(s).toSeq == Seq(1L, 2L, 1L, 0L, 0L, 1L, 0L, 2L, 0L))
    // a shard with NO valid record is not a WARC shard
    assert(WarcKernel.info(shard("nope\r\n\r\n".getBytes)).head == 0L)
    // Content-Length lying about the block size invalidates the record
    val lying = new String(good, "US-ASCII").replace("Content-Length: 2",
      "Content-Length: 3").getBytes("US-ASCII")
    assert(WarcKernel.info(shard(good, lying)).toSeq.take(3) == Seq(1L, 2L, 1L))
    // WARC/0.9 version line invalidates
    val oldVer = new String(good, "US-ASCII").replace("WARC/1.0", "WARC/0.9")
      .getBytes("US-ASCII")
    assert(WarcKernel.info(shard(oldVer)).head == 0L)
  }

  test("degrade taxonomy: member CRC tamper ticks n_crc_bad; structural damage fails") {
    val rec = WarcKernel.record("metadata", "<urn:uuid:5-0>",
      "2026-08-16T00:00:00Z", null, "payload".getBytes("US-ASCII"))
    val m0 = member(rec); val m1 = member(rec)
    // tamper the SECOND member's stored CRC: record still counts, crc ticks
    m1(m1.length - 8) = (m1(m1.length - 8) ^ 0xff).toByte
    assert(WarcKernel.info(m0 ++ m1).toSeq ==
      Seq(1L, 2L, 2L, 0L, 0L, 2L, 0L, 14L, 1L))
    // truncated second member: the whole row fails (cannot trust counts)
    assert(WarcKernel.info((m0 ++ m1).dropRight(3)).head == 0L)
    // garbage between members: fails at the member boundary
    assert(WarcKernel.info(m0 ++ "XX".getBytes ++ m1).head == 0L)
    assert(WarcKernel.info("NOTAWARC".getBytes).head == 0L)
    assert(WarcKernel.info(null).head == 0L)
  }

  test("firstOkHtmlBody: skips non-200 responses, needs a header/body split") {
    val notFound = WarcKernel.record("response", "<urn:uuid:6-0>",
      "2026-08-16T00:00:00Z", "http://example.com/6",
      "HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n<p>nope</p>"
        .getBytes("US-ASCII"))
    val ok = WarcKernel.record("response", "<urn:uuid:6-1>",
      "2026-08-16T00:00:00Z", "http://example.com/6",
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>the page</p>"
        .getBytes("US-ASCII"))
    val meta = WarcKernel.record("metadata", "<urn:uuid:6-2>",
      "2026-08-16T00:00:00Z", null, "k: v".getBytes("US-ASCII"))
    assert(WarcKernel.firstOkHtmlBody(shard(notFound, ok, meta)) == "<p>the page</p>")
    // no 200 anywhere -> null; header-only 200 message -> null
    assert(WarcKernel.firstOkHtmlBody(shard(notFound, meta)) == null)
    val headerOnly = WarcKernel.record("response", "<urn:uuid:6-3>",
      "2026-08-16T00:00:00Z", "http://example.com/6",
      "HTTP/1.1 200 OK\r\nContent-Length: 0".getBytes("US-ASCII"))
    assert(WarcKernel.firstOkHtmlBody(shard(headerOnly)) == null)
    assert(WarcKernel.firstOkHtmlBody("NOTAWARC".getBytes) == null)
    assert(WarcKernel.firstOkHtmlBody(null) == null)
  }

  test("chunked Transfer-Encoding bodies de-chunk byte-exactly; bad framing yields null") {
    val page = "<p>chunked page with some length to it</p>" * 5
    def chunkedResp(body: Array[Byte]) = WarcKernel.record("response",
      "<urn:uuid:6-4>", "2026-08-16T00:00:00Z", "http://example.com/6",
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n").getBytes("US-ASCII") ++ body)
    // exact recovery across a chunk size that splits mid-tag, incl. a
    // final short chunk
    assert(WarcKernel.firstOkHtmlBody(
      shard(chunkedResp(WarcKernel.chunkEncode(page.getBytes("UTF-8"), 37)))) == page)
    // chunk extensions after ';' are ignored per RFC 9112
    val withExt = ("25;ext=1\r\n" + page.take(37) + "\r\n" +
      java.lang.Integer.toHexString(page.length - 37) + "\r\n" + page.drop(37) +
      "\r\n0\r\n\r\n").getBytes("UTF-8")
    assert(WarcKernel.firstOkHtmlBody(shard(chunkedResp(withExt))) == page)
    // HTTP/1.0 plain bodies extract too (the other r17 breadth gap)
    val v10 = WarcKernel.record("response", "<urn:uuid:6-5>",
      "2026-08-16T00:00:00Z", "http://example.com/6",
      "HTTP/1.0 200 OK\r\nContent-Type: text/html\r\n\r\n<p>ten</p>"
        .getBytes("US-ASCII"))
    assert(WarcKernel.firstOkHtmlBody(shard(v10)) == "<p>ten</p>")
    // framing violations: non-hex size, size overrunning the block,
    // missing zero-terminator — all null, never a half-decoded body
    assert(WarcKernel.firstOkHtmlBody(
      shard(chunkedResp("zz\r\nhello\r\n0\r\n\r\n".getBytes("US-ASCII")))) == null)
    assert(WarcKernel.firstOkHtmlBody(
      shard(chunkedResp("fff\r\nhello\r\n0\r\n\r\n".getBytes("US-ASCII")))) == null)
    assert(WarcKernel.firstOkHtmlBody(
      shard(chunkedResp("5\r\nhello\r\n".getBytes("US-ASCII")))) == null)
  }

  test("capstone chain: shard -> 200 body -> html extraction recovers the exact text") {
    val ids = Seq(
      (7L, "seven is on the error-page plant cycle", 2), // 7 % 7 == 0: 404 first
      (8L, "eight goes straight to the ok response", 3), // 8 % 3 == 2: plain 1.1
      (9L, "nine rides the chunked transfer plant", 1) //  9 % 3 == 0: chunked
    ).toDF("media_id", "text", "n_nav")
    val body = Multimodal.warcResponseBody(
      Multimodal.syntheticWarcHtmlShards(ids).select(col("media_id"), col("content")),
      "content")
    val got = Multimodal.htmlExtract(body.select(col("media_id"), col("html")), "html")
      .orderBy("media_id").collect()
    assert(got(0).getBoolean(1) &&
      got(0).getString(5) == "seven is on the error-page plant cycle")
    assert(got(1).getBoolean(1) &&
      got(1).getString(5) == "eight goes straight to the ok response")
    assert(got(0).getString(2) == "doc 7 & co" && got(1).getInt(3) == 4)
    // the chunked shard recovers the exact text through the de-chunker
    assert(got(2).getBoolean(1) &&
      got(2).getString(5) == "nine rides the chunked transfer plant")
  }

  test("DataFrame chain: syntheticWarcShards -> warcInfo round-trips the plants") {
    val ids = Seq((7L, 4, false), (11L, 3, true))
      .toDF("media_id", "n_rec", "corrupt_crc")
    val got = Multimodal.warcInfo(
        Multimodal.syntheticWarcShards(ids).select(col("media_id"), col("content")),
        "content")
      .orderBy("media_id").collect()
    // media 7: j=0 response(L=10+(49)%90=59, (7+0)%6=1 -> 200, +19),
    //          j=1 request(L=10+(49+13)%90=72), j=2 metadata(L=10+75%90=85),
    //          j=3 response(L=10+88%90=98, (7+3)%6=4 -> 200, +19)
    val r7 = got(0)
    assert(r7.getBoolean(1) && r7.getLong(2) == 4L && r7.getLong(3) == 4L)
    assert(r7.getLong(4) == 2L && r7.getLong(5) == 1L && r7.getLong(6) == 1L)
    assert(r7.getLong(7) == 2L)
    assert(r7.getLong(8) == (59 + 19 + 72 + 85 + 98 + 19).toLong)
    assert(r7.getLong(9) == 0L)
    // media 11: corrupt_crc plants exactly one bad trailer, counts intact
    val r11 = got(1)
    assert(r11.getBoolean(1) && r11.getLong(2) == 3L && r11.getLong(3) == 3L &&
      r11.getLong(9) == 1L)
  }
}
