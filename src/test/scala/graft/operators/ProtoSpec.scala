package graft.operators

import graft.TestSpark
import graft.functions.ProtoKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The proto wire leg (q349): pins the wire mechanics the SQL oracle
  * only sees in aggregate — multi-byte varints, fixed-width stepping,
  * the group/invalid wire types, field 0, and truncation shapes —
  * plus a composition case: the wire walk over a real TFRecord
  * payload. */
class ProtoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def msg(build: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(); build(out); out.toByteArray
  }

  test("wire walk: multi-byte varints, fixed64/fixed32 step, empty message") {
    val m = msg { out =>
      ProtoKernel.writeVarintField(out, 1, 300L) // 2-byte varint value
      ProtoKernel.writeVarintField(out, 16, 1L) // 2-byte TAG (field 16)
      ProtoKernel.writeBytesField(out, 2, "abcde".getBytes)
      out.write((3 << 3) | 1); (0 until 8).foreach(_ => out.write(0x11)) // fixed64
      out.write((4 << 3) | 5); (0 until 4).foreach(_ => out.write(0x22)) // fixed32
    }
    // [is_proto, n_fields, n_varint, n_len, varint_sum, len_total]
    assert(ProtoKernel.info(m).toSeq == Seq(1L, 5L, 2L, 1L, 301L, 5L))
    assert(ProtoKernel.info(Array.empty[Byte]).toSeq == Seq(1L, 0L, 0L, 0L, 0L, 0L))
  }

  test("fail taxonomy: groups, field 0, truncated varint, length overrun") {
    // deprecated group wire type 3
    assert(ProtoKernel.info(Array(((1 << 3) | 3).toByte)).head == 0L)
    // field number 0 (tag 0 = field 0, wire 0)
    assert(ProtoKernel.info(Array(0x00.toByte, 0x01.toByte)).head == 0L)
    // unterminated varint at EOF
    assert(ProtoKernel.info(Array(0x08.toByte, 0xff.toByte)).head == 0L)
    // length-delimited field claiming more bytes than remain
    assert(ProtoKernel.info(Array(0x12.toByte, 0x05.toByte, 'x'.toByte)).head == 0L)
    // fixed64 without 8 bytes
    assert(ProtoKernel.info(Array(((1 << 3) | 1).toByte, 0x00.toByte)).head == 0L)
    assert(ProtoKernel.info(null).head == 0L)
  }

  test("composition: the wire walk audits a TFRecord shard's record payloads") {
    val payloads = Seq(
      msg(out => ProtoKernel.writeVarintField(out, 1, 7L)),
      msg(out => ProtoKernel.writeBytesField(out, 2, "tf".getBytes)))
    val shard = graft.functions.TfRecordKernel.tfrecord(payloads)
    // frame walk says two records; each payload independently wire-walks
    assert(graft.functions.TfRecordKernel.info(shard).toSeq(1) == 2L)
    assert(ProtoKernel.info(payloads(0)).toSeq == Seq(1L, 1L, 1L, 0L, 7L, 0L))
    assert(ProtoKernel.info(payloads(1)).toSeq == Seq(1L, 1L, 0L, 1L, 0L, 2L))
  }

  test("DataFrame chain: protoMessages -> protoInfo round-trips the plants") {
    val ids = Seq((3L, 4, false), (11L, 2, true))
      .toDF("media_id", "n_f", "truncate_field")
    val got = Multimodal.protoInfo(
        Multimodal.protoMessages(ids).select(col("media_id"), col("content")),
        "content")
      .orderBy("media_id").collect()
    // id 3: k=0 v=(39)%1000=39, k=1 blen=3+4%20=7, k=2 v=39+14=53, k=3 blen=3+6%20=9
    val r3 = got(0)
    assert(r3.getBoolean(1) && r3.getLong(2) == 4L && r3.getLong(3) == 2L &&
      r3.getLong(4) == 2L && r3.getLong(5) == (39 + 53).toLong &&
      r3.getLong(6) == (7 + 9).toLong)
    // id 11: truncated trailing field fails the row
    assert(!got(1).getBoolean(1) && got(1).isNullAt(2))
  }
}
