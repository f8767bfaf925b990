package graft.operators

import graft.TestSpark
import graft.functions.TarKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ustar/WebDataset shard leg (q339): pins what the SQL oracle cannot
  * see — the header byte layout (octal fields, POSIX magic+version,
  * checksum layout), acceptance of the GNU magic variant, non-file
  * typeflag handling, sample-key grouping edges, and the degrade
  * taxonomy (the JDK ships no tar reader, so unlike q337/q338 there is
  * no in-process real-consumer parity check; the CRC-checked gzip layers
  * carry that burden for the container family). */
class TarSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def shard(entries: Array[Byte]*): Array[Byte] =
    entries.reduce(_ ++ _) ++ new Array[Byte](1024)

  test("header layout: octal fields, POSIX magic, verified checksum, padding") {
    val e = TarKernel.entry("a/0.txt", "hello".getBytes, mtime = 12345L)
    assert(e.length == 1024) // 512 header + 5 bytes padded to 512
    assert(new String(e, 257, 5, "US-ASCII") == "ustar" && e(262) == 0)
    assert(new String(e, 263, 2, "US-ASCII") == "00") // POSIX version
    assert(new String(e, 124, 11, "US-ASCII") == "00000000005") // size, octal
    assert(new String(e, 136, 11, "US-ASCII") == "00000030071") // 12345 octal
    assert(e(154) == 0 && e(155) == ' ') // chksum "%06o\0 "
    // [is_tar, n_entries, n_keys, total_size, n_txt, n_bin, n_chksum_bad]
    assert(TarKernel.info(shard(e)).toSeq == Seq(1L, 1L, 1L, 5L, 1L, 0L, 0L))
  }

  test("sample grouping: two files per key, extensionless names, GNU magic") {
    val s = shard(
      TarKernel.entry("s1/0.txt", "aa".getBytes, 0L),
      TarKernel.entry("s1/0.bin", "bbb".getBytes, 0L),
      TarKernel.entry("s1/1.txt", "cccc".getBytes, 0L),
      TarKernel.entry("README", "no extension".getBytes, 0L))
    assert(TarKernel.info(s).toSeq == Seq(1L, 4L, 3L, 21L, 2L, 1L, 0L))
    // GNU magic "ustar  \0" (version " \0") is accepted by the walk
    val g = TarKernel.entry("g.txt", "z".getBytes, 0L)
    g(262) = ' '; g(263) = ' '; g(264) = 0
    // re-stamp the checksum over the mutated magic bytes
    val ckField = "      ".getBytes("US-ASCII")
    System.arraycopy(ckField, 0, g, 148, 6); g(154) = 0x20; g(155) = 0x20
    var ck = 0L; var i = 0
    while (i < 512) { ck += (if (i >= 148 && i < 156) 0x20L else (g(i) & 0xffL)); i += 1 }
    var j = 153; var x = ck
    while (j >= 148) { g(j) = ('0' + (x & 7)).toByte; x >>= 3; j -= 1 }
    g(154) = 0; g(155) = ' '
    assert(TarKernel.info(shard(g)).toSeq == Seq(1L, 1L, 1L, 1L, 1L, 0L, 0L))
  }

  test("typeflag: non-file entries step but never count") {
    val dir = TarKernel.entry("s1", Array.empty[Byte], 0L)
    dir(156) = '5' // directory
    // re-stamp checksum after the typeflag change
    var ck = 0L; var i = 0
    while (i < 512) { ck += (if (i >= 148 && i < 156) 0x20L else (dir(i) & 0xffL)); i += 1 }
    var j = 153; var x = ck
    while (j >= 148) { dir(j) = ('0' + (x & 7)).toByte; x >>= 3; j -= 1 }
    val f = TarKernel.entry("s1/0.txt", "ab".getBytes, 0L)
    assert(TarKernel.info(shard(dir, f)).toSeq == Seq(1L, 1L, 1L, 2L, 1L, 0L, 0L))
  }

  test("degrade taxonomy: checksum tamper excludes the entry; damage fails the row") {
    val a = TarKernel.entry("k/0.txt", "12345".getBytes, 0L)
    val b = TarKernel.entry("k/0.bin", "123456789".getBytes, 0L)
    val s = shard(a, b)
    // zero the SECOND entry's checksum field: excluded from tallies, walk continues
    var i = 0
    while (i < 8) { s(1024 + 148 + i) = 0; i += 1 }
    assert(TarKernel.info(s).toSeq == Seq(1L, 1L, 1L, 5L, 1L, 0L, 1L))
    // bad magic fails the row
    val m = shard(a); m(257) = 'X'
    assert(TarKernel.info(m).head == 0L)
    // truncation (payload runs past the bytes) fails
    assert(TarKernel.info(shard(a).take(1024)).head == 0L)
    // garbage after the end-of-archive block fails
    val gTail = shard(a) ++ Array.fill[Byte](512)(7)
    assert(TarKernel.info(gTail).head == 0L)
    // wholesale garbage and null fail
    assert(TarKernel.info("NOTATAR!".getBytes).head == 0L)
    assert(TarKernel.info(null).head == 0L)
  }

  test("DataFrame chain: syntheticTarShards -> tarInfo round-trips the plants") {
    val ids = Seq((7L, 3, false), (11L, 2, true))
      .toDF("media_id", "n_samples", "corrupt_chksum")
    val got = Multimodal.tarInfo(
        Multimodal.syntheticTarShards(ids).select(col("media_id"), col("content")),
        "content")
      .orderBy("media_id").collect()
    // media 7: lt_k = 5+(21+7k)%60 -> 26,33,40; lb_k = 20+(35+11k)%100 -> 55,66,77
    val r7 = got(0)
    assert(r7.getBoolean(1) && r7.getLong(2) == 6L && r7.getLong(3) == 3L)
    assert(r7.getLong(4) == (26 + 33 + 40 + 55 + 66 + 77).toLong)
    assert(r7.getLong(5) == 3L && r7.getLong(6) == 3L && r7.getLong(7) == 0L)
    // media 11: last .bin excluded -> n_entries 3, n_bin 1, key survives via .txt
    // lt_k = 5+(33+7k)%60 -> 38,45; lb_k = 20+(55+11k)%100 -> 75,86(dropped)
    val r11 = got(1)
    assert(r11.getBoolean(1) && r11.getLong(2) == 3L && r11.getLong(3) == 2L)
    assert(r11.getLong(4) == (38 + 45 + 75).toLong)
    assert(r11.getLong(5) == 2L && r11.getLong(6) == 1L && r11.getLong(7) == 1L)
  }
}
