package graft.streaming

import graft.TestSpark
import graft.functions.PcmKernel
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming audio monitor: the drained readout equals the batch stats
  * merged globally, null audio counts as an empty row, and batch
  * placement/replay cannot change the cumulative state. */
class StreamingAudioMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val clips: Seq[Array[Byte]] =
    Seq(PcmKernel.synth(3L, 64), PcmKernel.synth(9L, 64), PcmKernel.synth(1057L, 64),
      null, Array.empty[Byte], PcmKernel.synth(42L, 10))

  private def tuples(seq0: Long): Seq[(Int, Long, Array[Byte])] =
    clips.zipWithIndex.map { case (a, i) => (i % 2, seq0 + i, a) }

  private def drain(batches: Seq[Seq[(Int, Long, Array[Byte])]], name: String): Seq[Row] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Int, Long, Array[Byte])]
    val q = StreamingAudioMonitor.stats(in.toDS(), frameSamples = 16,
        energyThreshold = 1L << 32)
      .toDF("shard", "epoch", "n_rows", "n_samples", "sum_sq", "peak",
        "zero_crossings", "n_frames", "active_frames")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  private def snapsDF(rows: Seq[Row]) =
    rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toDF("shard", "epoch", "n_rows", "n_samples", "sum_sq", "peak",
        "zero_crossings", "n_frames", "active_frames")

  /** Batch truth: the same kernel run locally and merged. */
  private def batchCard: (Long, Long, Long, Long) = {
    val sts = clips.map(a =>
      PcmKernel.stats(if (a == null) Array.empty[Byte] else a, 16, 1L << 32))
    (clips.size.toLong, sts.map(_(0)).sum, sts.map(_(2)).max, sts.map(_(3)).sum)
  }

  test("3-micro-batch drained readout equals the batch kernel merged globally") {
    val all = tuples(0L)
    val rows = drain(Seq(all.take(2), all.slice(2, 4), all.drop(4)), "au_drain")
    val got = StreamingAudioMonitor.readout(snapsDF(rows)).collect().head
    val (n, samples, peak, zc) = batchCard
    assert(got.getLong(0) == n && got.getLong(1) == samples &&
      got.getLong(2) == peak && got.getLong(3) == zc)
    // rms/activity are the quantized batch divisions of the same sums
    val ss = clips.map(a =>
      PcmKernel.stats(if (a == null) Array.empty[Byte] else a, 16, 1L << 32)(1)).sum
    assert(got.getDouble(4) == graft.functions.Quantize.scaledFloorDouble(
      math.sqrt(ss.toDouble / samples.toDouble), 6))
  }

  test("batch placement and replay cannot change the readout") {
    val all = tuples(0L)
    val a = StreamingAudioMonitor.readout(snapsDF(drain(Seq(all), "au_r1"))).collect().head
    val b = StreamingAudioMonitor.readout(snapsDF(
      drain(Seq(all.take(1), all.slice(1, 2), all.drop(2)), "au_r2"))).collect().head
    assert(a == b)
  }
}
