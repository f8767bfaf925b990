package graft.operators

import graft.TestSpark
import graft.functions.ZipKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The zip leg (q346): pins what the SQL oracle cannot see —
  * real-consumer parity (the JDK's `ZipInputStream` must read our
  * hand-written headers and reproduce the payloads), the
  * directory-first walk mechanics, unsupported methods, and the degrade
  * taxonomy. */
class ZipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val entries = Seq[(String, Array[Byte], Boolean)](
    ("a.txt", "stored payload".getBytes("US-ASCII"), true),
    ("b.txt", ("deflate me " * 8).getBytes("US-ASCII"), false),
    ("c/d.bin", Array.fill[Byte](100)(7), false))

  test("round trip: directory-first walk counts methods, sizes, verifies streams") {
    val bytes = ZipKernel.zip(entries)
    // [is_zip, n_entries, n_stored, total_usize, n_crc_bad, n_verify_fail]
    assert(ZipKernel.info(bytes).toSeq ==
      Seq(1L, 3L, 1L, (14 + 88 + 100).toLong, 0L, 0L))
    // empty archive: EOCD only, zero entries
    assert(ZipKernel.info(ZipKernel.zip(Seq.empty)).toSeq ==
      Seq(1L, 0L, 0L, 0L, 0L, 0L))
  }

  test("JDK ZipInputStream parity: hand-written headers read back byte-exactly") {
    val in = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(ZipKernel.zip(entries)))
    entries.foreach { case (name, payload, _) =>
      val e = in.getNextEntry
      assert(e.getName == name)
      assert(in.readAllBytes().toSeq == payload.toSeq)
    }
    assert(in.getNextEntry == null)
  }

  test("degrade taxonomy: directory CRC tamper ticks; damage fails or flags") {
    val bytes = ZipKernel.zip(entries)
    val tampered = ZipKernel.tamperLastDirectoryCrc(bytes.clone())
    assert(ZipKernel.info(tampered).toSeq ==
      Seq(1L, 3L, 1L, 202L, 1L, 0L))
    // unsupported method in the directory: verify_fail, excluded from tallies
    val cdAt = {
      // EOCD cdOffset field at tail-6 (comment-free)
      val e = bytes.length - 22
      ((bytes(e + 16) & 0xffL) | ((bytes(e + 17) & 0xffL) << 8) |
        ((bytes(e + 18) & 0xffL) << 16) | ((bytes(e + 19) & 0xffL) << 24)).toInt
    }
    val badMethod = bytes.clone()
    badMethod(cdAt + 10) = 9 // method 9 = deflate64, unsupported
    val m = ZipKernel.info(badMethod).toSeq
    assert(m == Seq(1L, 3L, 0L, (88 + 100).toLong, 0L, 1L))
    // no EOCD anywhere: not a zip
    assert(ZipKernel.info(bytes.take(bytes.length - 22)).head == 0L)
    assert(ZipKernel.info("NOTAZIP!".getBytes).head == 0L)
    assert(ZipKernel.info(null).head == 0L)
  }

  test("EOCD discovery survives a trailing comment containing the signature bytes (r17 advice)") {
    // real-world zips may carry an archive comment; one whose text
    // contains PK\5\6 used to win the backward scan (highest offset) and
    // yield a bogus EOCD — candidates are now validated (comment length
    // must land the record at EOF, directory offset+size must end at the
    // record) and the scan continues past impostors
    val base = ZipKernel.zip(entries)
    // comment embeds an ADVERSARIAL fake EOCD: real signature bytes with
    // a zeroed comment-length field, so the fake 22-byte record lands
    // exactly at EOF and passes the first validation clause -- only the
    // directory offset+size check unmasks it
    val comment = "cmt".getBytes("US-ASCII") ++
      Array[Byte](0x50, 0x4b, 0x05, 0x06) ++ new Array[Byte](18)
    val withComment = new Array[Byte](base.length + comment.length)
    System.arraycopy(base, 0, withComment, 0, base.length)
    System.arraycopy(comment, 0, withComment, base.length, comment.length)
    // patch the real EOCD's comment-length field (tail of the base bytes)
    val e = base.length - 22
    withComment(e + 20) = (comment.length & 0xff).toByte
    withComment(e + 21) = ((comment.length >> 8) & 0xff).toByte
    assert(ZipKernel.info(withComment).toSeq ==
      Seq(1L, 3L, 1L, 202L, 0L, 0L))
    // and an UNPATCHED comment-length (record does not reach EOF) means
    // no candidate validates anywhere: fail loud, not wrong-but-plausible
    val broken = new Array[Byte](base.length + comment.length)
    System.arraycopy(base, 0, broken, 0, base.length)
    System.arraycopy(comment, 0, broken, base.length, comment.length)
    assert(ZipKernel.info(broken).head == 0L)
  }

  test("DataFrame chain: zipArchives -> zipInfo round-trips the plants") {
    val ids = Seq((4L, 3, false), (11L, 2, true))
      .toDF("media_id", "n_ent", "tamper_crc")
    val got = Multimodal.zipInfo(
        Multimodal.zipArchives(ids).select(col("media_id"), col("content")),
        "content")
      .orderBy("media_id").collect()
    // id 4: usize_k = 7+(12+5k)%50 -> 19,24,29; stored when (4+k)%3==0 -> k=2
    val r4 = got(0)
    assert(r4.getBoolean(1) && r4.getLong(2) == 3L && r4.getLong(3) == 1L)
    assert(r4.getLong(4) == (19 + 24 + 29).toLong && r4.getLong(5) == 0L &&
      r4.getLong(6) == 0L)
    // id 11: usize_k = 7+(33+5k)%50 -> 40,45; stored when (11+k)%3==0 -> k=1;
    // tampered last directory CRC
    val r11 = got(1)
    assert(r11.getBoolean(1) && r11.getLong(2) == 2L && r11.getLong(3) == 1L)
    assert(r11.getLong(4) == 85L && r11.getLong(5) == 1L && r11.getLong(6) == 0L)
  }
}
