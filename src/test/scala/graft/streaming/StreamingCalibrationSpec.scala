package graft.streaming

import graft.TestSpark
import graft.operators.Profiler
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming calibration monitor: drained card ≡ batch reliabilityCard
  * bit-for-bit over the same rows, micro-batch placement invariance,
  * bins-bounded state, and the clamped-edge-bucket contract. */
class StreamingCalibrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Bins = 10

  private def drain(batches: Seq[Seq[(Int, Long, Double, Boolean)]],
      name: String): Seq[Row] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Int, Long, Double, Boolean)]
    val q = StreamingCalibration.binCounts(in.toDS(), Bins)
      .toDF("shard", "epoch", "bin", "n", "s7", "pos")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  private def cardOf(rows: Seq[Row]): Seq[Row] = {
    val snaps = rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))
      .toDF("shard", "epoch", "bin", "n", "s7", "pos")
    StreamingCalibration.card(snaps).orderBy("bin").collect().toSeq
  }

  // deterministic scores spread over all buckets, including exact bucket
  // boundaries and out-of-range values exercising the clamp
  private val rows: Seq[(Double, Boolean)] =
    (1 to 200).map { i =>
      val s = (i * 37 % 101) / 100.0
      (s, i % 3 == 0)
    } ++ Seq((-0.25, true), (1.75, false), (0.0, true), (1.0, false))

  test("3-micro-batch drain card is bit-identical to batch reliabilityCard") {
    val stream = rows.zipWithIndex.map { case ((s, y), i) => (i % 3, i.toLong, s, y) }
    val got = cardOf(drain(
      Seq(stream.take(70), stream.slice(70, 150), stream.drop(150)), "cal_fold"))
    val expected = Profiler.reliabilityCard(
      rows.toDF("score", "label"), "score", "label", Bins)
      .orderBy("bin").collect().toSeq
    assert(got == expected, s"drain ≠ batch:\n$got\nvs\n$expected")
    // clamp contract visible: edge buckets hold the out-of-range rows
    assert(got.map(_.getLong(0)).min == 0L && got.map(_.getLong(0)).max == Bins - 1L)
  }

  test("micro-batch placement and shard count cannot move the card") {
    val oneShard = rows.zipWithIndex.map { case ((s, y), i) => (0, i.toLong, s, y) }
    val fourShards = rows.zipWithIndex.map { case ((s, y), i) => (i % 4, i.toLong, s, y) }
    val a = cardOf(drain(Seq(oneShard), "cal_a"))
    val b = cardOf(drain(Seq(fourShards.take(9), fourShards.slice(9, 123),
      fourShards.drop(123)), "cal_b"))
    assert(a == b, "shard layout / batch placement must not change the card")
  }

  test("a replayed max-epoch snapshot (at-least-once sink) does not double-count the card") {
    val stream = rows.zipWithIndex.map { case ((s, y), i) => (i % 2, i.toLong, s, y) }
    val snaps = drain(Seq(stream), "cal_replay")
    val maxEpochRows = snaps.filter(r => r.getLong(1) == snaps.map(_.getLong(1)).max)
    val clean = cardOf(snaps)
    val replayed = cardOf(snaps ++ maxEpochRows) // duplicate delivery
    assert(replayed == clean, "duplicated snapshot delivery must not move the card")
  }

  test("state stays bins-bounded: a shard's snapshot never exceeds bins rows per epoch") {
    val stream = rows.zipWithIndex.map { case ((s, y), i) => (0, i.toLong, s, y) }
    val snaps = drain(Seq(stream.take(100), stream.drop(100)), "cal_bound")
    snaps.groupBy(r => (r.getInt(0), r.getLong(1))).foreach { case (k, rs) =>
      assert(rs.size <= Bins, s"snapshot $k has ${rs.size} rows > $Bins")
      assert(rs.map(_.getLong(2)).distinct.size == rs.size, s"duplicate bins in $k")
    }
  }
}
