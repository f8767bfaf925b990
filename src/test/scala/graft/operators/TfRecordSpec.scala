package graft.operators

import graft.TestSpark
import graft.functions.TfRecordKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The TFRecord leg (q347): pins the masked-CRC32C arithmetic against a
  * published reference vector and the two checksum channels' distinct
  * semantics (length lie fails the row, data lie ticks), which the SQL
  * oracle only sees in aggregate. */
class TfRecordSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("round trip: framing walk counts records and bytes; empty shard is valid") {
    val payloads = Seq("alpha".getBytes, Array.empty[Byte], ("x" * 200).getBytes)
    // [is_tfrecord, n_records, total_bytes, n_crc_bad]
    assert(TfRecordKernel.info(TfRecordKernel.tfrecord(payloads)).toSeq ==
      Seq(1L, 3L, 205L, 0L))
    assert(TfRecordKernel.info(Array.empty[Byte]).toSeq == Seq(1L, 0L, 0L, 0L))
  }

  test("masked CRC32C reference vector: the mask constant and rotation are exact") {
    // CRC32C("123456789") = 0xE3069283 (the Castagnoli check value);
    // masked = ((crc >>> 15) | (crc << 17)) + 0xa282ead8 (mod 2^32)
    val crc = {
      val c = new java.util.zip.CRC32C(); c.update("123456789".getBytes); c.getValue
    }
    assert(crc == 0xe3069283L)
    val masked = ((((crc >>> 15) | (crc << 17)) & 0xffffffffL) + 0xa282ead8L) & 0xffffffffL
    // the kernel's framing must embed exactly this value for this payload
    val shard = TfRecordKernel.tfrecord(Seq("123456789".getBytes))
    val at = shard.length - 4
    val embedded = (shard(at) & 0xffL) | ((shard(at + 1) & 0xffL) << 8) |
      ((shard(at + 2) & 0xffL) << 16) | ((shard(at + 3) & 0xffL) << 24)
    assert(embedded == masked)
  }

  test("channel semantics: data-CRC lie ticks, length-CRC lie fails the row") {
    val shard = TfRecordKernel.tfrecord(Seq("one".getBytes, "twotwo".getBytes))
    // flip the LAST record's data crc: record counts, n_crc_bad ticks
    val d = shard.clone(); d(d.length - 4) = (d(d.length - 4) ^ 0xff).toByte
    assert(TfRecordKernel.info(d).toSeq == Seq(1L, 2L, 9L, 1L))
    // flip the FIRST record's LENGTH crc (offset 8): framing untrusted -> fail
    val l = shard.clone(); l(8) = (l(8) ^ 0xff).toByte
    assert(TfRecordKernel.info(l).head == 0L)
    // truncation mid-record and garbage fail
    assert(TfRecordKernel.info(shard.dropRight(2)).head == 0L)
    assert(TfRecordKernel.info("NOTATFRECORD".getBytes).head == 0L)
    assert(TfRecordKernel.info(null).head == 0L)
  }

  test("DataFrame chain: tfrecordShards -> tfrecordInfo round-trips the plants") {
    val ids = Seq((6L, 4, false), (11L, 3, true))
      .toDF("media_id", "n_rec", "tamper_crc")
    val got = Multimodal.tfrecordInfo(
        Multimodal.tfrecordShards(ids).select(col("media_id"), col("content")),
        "content")
      .orderBy("media_id").collect()
    // id 6: len_k = 5+(42+11k)%80 -> 47,58,69,80 = 254
    val r6 = got(0)
    assert(r6.getBoolean(1) && r6.getLong(2) == 4L && r6.getLong(3) == 254L &&
      r6.getLong(4) == 0L)
    // id 11: len_k = 5+(77+11k)%80 -> 82,13,24 = 119; data-crc tamper ticks
    val r11 = got(1)
    assert(r11.getBoolean(1) && r11.getLong(2) == 3L && r11.getLong(3) == 119L &&
      r11.getLong(4) == 1L)
  }
}
