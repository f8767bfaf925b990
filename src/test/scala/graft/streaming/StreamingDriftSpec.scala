package graft.streaming

import graft.TestSpark
import graft.operators.Profiler
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming drift monitor: drained PSI ≡ batch Profiler.psi bit-for-bit
  * over the same rows, micro-batch placement invariance, bins-bounded
  * state, and the clamped-edge-bin contract. */
class StreamingDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val MinV = 0L
  private val MaxV = 255L
  private val Bins = 16

  private def drain(batches: Seq[Seq[(Int, Long, Long)]], name: String): Seq[Row] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Int, Long, Long)]
    val q = StreamingDrift.binCounts(in.toDS(), MinV, MaxV, Bins)
      .toDF("shard", "epoch", "bin", "cnt")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  private def psiOf(rows: Seq[Row], reference: Seq[Long]): Seq[Row] = {
    val snaps = rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toDF("shard", "epoch", "bin", "cnt")
    val ref = Profiler.histogram(reference.toDF("v"), "v", Seq.empty, MinV, MaxV, Bins)
    StreamingDrift.psiVsReference(snaps, ref, Bins).collect().toSeq
  }

  // reference: roughly uniform; live: shifted + clamped tails (planted drift)
  private val reference: Seq[Long] = (1 to 300).map(i => (i * 17 % 256).toLong)
  private val live: Seq[Long] =
    (1 to 300).map(i => (i * 17 % 256).toLong + 90L) ++ Seq(-5L, 400L, 0L, 255L)

  test("bin arithmetic parity: the long-math fold bins exactly like the zBucket Column on hostile values") {
    // seeded sweep across the domain, the clamp edges, and far outliers —
    // one DataFrame pass compares every value's Column bin to the fold's
    val rnd = new scala.util.Random(42)
    val values = Seq(Long.MinValue / 4, -1L, 0L, 1L, 127L, 128L, 255L, 256L,
      Long.MaxValue / 4) ++ Seq.fill(500)(rnd.nextLong() % 1024L)
    val bits = java.lang.Integer.numberOfTrailingZeros(Bins)
    val viaColumn = values.toDF("v")
      .select(col("v"), graft.sinks.ClusteredWrite.zBucket(
        greatest(lit(MinV), least(lit(MaxV), col("v"))), MinV, MaxV, bits).as("bin"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    values.foreach { v =>
      val clamped = math.max(MinV, math.min(MaxV, v))
      val bin = (clamped - MinV) * (1L << bits) / (MaxV - MinV + 1L)
      assert(bin == viaColumn(v), s"bin mismatch at $v: scala=$bin column=${viaColumn(v)}")
    }
  }

  test("3-micro-batch drain PSI is bit-identical to batch psi") {
    val stream = live.zipWithIndex.map { case (v, i) => (i % 3, i.toLong, v) }
    val got = psiOf(drain(
      Seq(stream.take(100), stream.slice(100, 220), stream.drop(220)), "drift_fold"),
      reference)
    val expected = Profiler.psi(reference.toDF("v"), live.toDF("v"), "v",
      MinV, MaxV, Bins).collect().toSeq
    assert(got == expected, s"drain ≠ batch:\n$got\nvs\n$expected")
    assert(got.head.getDouble(0) > 0.25, "planted shift must read as major drift")
  }

  test("micro-batch placement and shard count cannot move the psi") {
    val one = live.zipWithIndex.map { case (v, i) => (0, i.toLong, v) }
    val four = live.zipWithIndex.map { case (v, i) => (i % 4, i.toLong, v) }
    val a = psiOf(drain(Seq(one), "drift_a"), reference)
    val b = psiOf(drain(Seq(four.take(7), four.slice(7, 201), four.drop(201)),
      "drift_b"), reference)
    assert(a == b, "shard layout / batch placement must not change the psi")
  }

  test("a replayed max-epoch snapshot (at-least-once sink) does not double-count the psi") {
    val stream = live.zipWithIndex.map { case (v, i) => (i % 2, i.toLong, v) }
    val snaps = drain(Seq(stream), "drift_replay")
    val maxEpochRows = snaps.filter(r => r.getLong(1) == snaps.map(_.getLong(1)).max)
    val clean = psiOf(snaps, reference)
    val replayed = psiOf(snaps ++ maxEpochRows, reference)
    assert(replayed == clean, "duplicated snapshot delivery must not move the psi")
  }

  test("state stays bins-bounded and clamps land in the edge bins") {
    val stream = live.zipWithIndex.map { case (v, i) => (0, i.toLong, v) }
    val snaps = drain(Seq(stream.take(150), stream.drop(150)), "drift_bound")
    snaps.groupBy(r => (r.getInt(0), r.getLong(1))).foreach { case (k, rs) =>
      assert(rs.size <= Bins, s"snapshot $k has ${rs.size} rows > $Bins")
    }
    val lastBins = snaps.filter(_.getLong(1) == 2L).map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(lastBins.contains(0L) && lastBins.contains(Bins - 1L),
      s"clamped -5 and 400 must land in the edge bins: $lastBins")
    assert(lastBins.keys.forall(b => b >= 0L && b < Bins))
  }
}
