package graft.streaming

import graft.TestSpark
import graft.functions.{GzipKernel, WarcKernel}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming container monitor: the drained readout equals the batch
  * walk merged globally, unwalkable shards count only in bad_rows, and
  * micro-batch placement cannot change the cumulative state. */
class StreamingContainerMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def member(rec: Array[Byte], tamper: Boolean = false): Array[Byte] = {
    val m = GzipKernel.gzip(rec, 0L, 0, 255, null)
    if (tamper) m(m.length - 8) = (m(m.length - 8) ^ 0xff).toByte
    m
  }

  private def rec(t: String, payload: String): Array[Byte] =
    WarcKernel.record(t, "<urn:uuid:s>", "2026-08-16T00:00:00Z",
      if (t == "metadata") null else "http://e.com/x", payload.getBytes("US-ASCII"))

  private val shards: Seq[Array[Byte]] = Seq(
    member(rec("response", "HTTP/1.1 200 OK\r\n\r\nbody")) ++
      member(rec("metadata", "k: v")),
    member(rec("request", "GET / HTTP/1.1"), tamper = true),
    "NOTAWARC".getBytes,
    member(rec("response", "HTTP/1.1 404 Not Found\r\n\r\n")))

  private def tuples: Seq[(Int, Long, Array[Byte])] =
    shards.zipWithIndex.map { case (b, i) => (i % 2, i.toLong, b) }

  private def drain(batches: Seq[Seq[(Int, Long, Array[Byte])]], name: String): Seq[Row] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Int, Long, Array[Byte])]
    val q = StreamingContainerMonitor.stats(in.toDS())
      .toDF("group", "epoch", "n_rows", "bad_rows", "n_members", "n_records",
        "n_response", "n_http_ok", "content_total", "n_crc_bad")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  private def readoutOf(rows: Seq[Row]): Row = {
    val df = rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9)))
      .toDF("group", "epoch", "n_rows", "bad_rows", "n_members", "n_records",
        "n_response", "n_http_ok", "content_total", "n_crc_bad")
    StreamingContainerMonitor.readout(df).collect().head
  }

  /** Batch truth from the same kernel. */
  private def batchCard: Seq[Long] = {
    val rs = shards.map(WarcKernel.info)
    val ok = rs.filter(_(0) == 1L)
    Seq(shards.size.toLong, rs.count(_(0) != 1L).toLong,
      ok.map(_(1)).sum, ok.map(_(2)).sum, ok.map(_(3)).sum,
      ok.map(_(6)).sum, ok.map(_(7)).sum, ok.map(_(8)).sum)
  }

  test("multi-batch drained readout equals the batch walk merged globally") {
    val all = tuples
    val got = readoutOf(drain(Seq(all.take(1), all.slice(1, 3), all.drop(3)), "ct_a"))
    val want = batchCard
    (0 until 8).foreach(i => assert(got.getLong(i) == want(i), s"field $i"))
    // sanity on the plants themselves: 1 bad shard, 1 crc-tampered member,
    // 2 responses of which 1 is http-ok
    assert(want(1) == 1L && want(7) == 1L && want(4) == 2L && want(5) == 1L)
  }

  test("batch placement is irrelevant: one batch and three batches agree") {
    val a = readoutOf(drain(Seq(tuples), "ct_one"))
    val b = readoutOf(drain(tuples.map(Seq(_)), "ct_many"))
    (0 until 8).foreach(i => assert(a.getLong(i) == b.getLong(i), s"field $i"))
  }
}
