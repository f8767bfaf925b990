package graft.streaming

import graft.TestSpark
import graft.operators.{Experiment, Inference, Sampling}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming continuous-metric monitor: drained Welch readout ≡ batch
  * momentPartial→welchFromMoments bit-for-bit, per-epoch cuts feed
  * msprtMeanReadout (the SRM→msprt composition on means), replay
  * idempotence, and the null-user last-arm contract. */
class StreamingMeanMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Salt = "mexp"

  private def drainPrefixes(
      batches: Seq[Seq[(Int, Long, String, Long)]],
      name: String): Seq[Seq[Row]] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Int, Long, String, Long)]
    val q = StreamingMeanMonitor.moments(in.toDS(), Salt)
      .toDF("shard", "epoch", "n_a", "sum_a", "sumsq_a", "n_b", "sum_b", "sumsq_b")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.map { b =>
        in.addData(b); q.processAllAvailable()
        spark.table(name).collect().toSeq
      }
    } finally q.stop()
  }

  private def snapsDF(rows: Seq[Row]) =
    rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toDF("shard", "epoch", "n_a", "sum_a", "sumsq_a", "n_b", "sum_b", "sumsq_b")

  // integral metric with distinct per-key values so both arms carry
  // spread (variance > 0) and the two arms differ
  private val units: Seq[(String, Long)] =
    (1L to 80L).map(i => (s"u$i", 10L + (i % 7) * 3L))

  test("3-micro-batch drained Welch readout is bit-identical to the batch moment path") {
    val stream = units.zipWithIndex.map { case ((u, v), i) => (i % 3, i.toLong, u, v) }
    val snaps = drainPrefixes(
      Seq(stream.take(30), stream.slice(30, 55), stream.drop(55)), "mean_fold").last
    val got = StreamingMeanMonitor.welchReadout(snapsDF(snaps)).collect().toSeq
    val batch = Sampling.hashSplit(units.toDF("u", "v"), "u",
      Seq("a" -> 0.5, "b" -> 0.5), Salt)
    val expected = Inference.welchFromMoments(
      Inference.momentPartial(batch, Seq("split"), "v", decimalScale = 0),
      "split", "a", "b").collect().toSeq
    assert(got == expected, s"drain ≠ batch:\n$got\nvs\n$expected")
  }

  test("composition: per-epoch drained cuts feed msprtMeanReadout — always-valid p over the live stream") {
    val stream = units.zipWithIndex.map { case ((u, v), i) => (i % 2, i.toLong, u, v) }
    val batches = Seq(stream.take(30), stream.slice(30, 60), stream.drop(60))
    val allRows = drainPrefixes(batches, "mean_compose").last
    // global cut at epoch e: per shard the max-epoch row <= e, long-summed
    val epochs = allRows.map(_.getLong(1)).distinct.sorted
    val cuts = epochs.map { e =>
      val perShard = allRows.filter(_.getLong(1) <= e)
        .groupBy(_.getInt(0)).values.map(_.maxBy(_.getLong(1)))
      (e, perShard.map(_.getLong(2)).sum, perShard.map(_.getLong(3)).sum,
        perShard.map(_.getLong(4)).sum, perShard.map(_.getLong(5)).sum,
        perShard.map(_.getLong(6)).sum, perShard.map(_.getLong(7)).sum)
    }.toDF("cut", "n_a", "sum_a", "sumsq_a", "n_b", "sum_b", "sumsq_b")
    val streamed = Experiment.msprtMeanReadout(cuts, "cut", tau2 = 1.0)
      .orderBy(col("cut")).collect().toSeq
    // ground truth: batch-assigned cumulative moments over the same prefixes
    val boundary = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val expected = Experiment.msprtMeanReadout(
      batches.indices.map { i =>
        val seen = batches.take(i + 1).flatten
        val (a, b) = seen.partition(t =>
          t._3 != null && StreamingSrmMonitor.keyHashLong(t._3, Salt) < boundary)
        def m(xs: Seq[Long]) = (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
        val (na, sa, qa) = m(a.map(_._4)); val (nb, sb, qb) = m(b.map(_._4))
        ((i + 1).toLong, na, sa, qa, nb, sb, qb)
      }.toDF("cut", "n_a", "sum_a", "sumsq_a", "n_b", "sum_b", "sumsq_b"),
      "cut", tau2 = 1.0)
      .orderBy(col("cut")).collect().toSeq
    assert(streamed == expected,
      s"streamed cuts diverged from batch cuts:\n$streamed\nvs\n$expected")
  }

  test("replayed max-epoch snapshots cannot move the readout; null users take the last arm") {
    val withNulls = units.take(10).zipWithIndex.map {
      case ((u, v), i) => (0, i.toLong, u, v)
    } ++ Seq((0, 97L, null.asInstanceOf[String], 42L),
      (0, 98L, null.asInstanceOf[String], 17L))
    val snaps = drainPrefixes(Seq(withNulls), "mean_nulls").last
    val maxE = snaps.map(_.getLong(1)).max
    val a = StreamingMeanMonitor.welchReadout(snapsDF(snaps)).collect().toSeq
    val b = StreamingMeanMonitor.welchReadout(
      snapsDF(snaps ++ snaps.filter(_.getLong(1) == maxE))).collect().toSeq
    assert(a == b, "duplicate delivery of the max-epoch snapshot must collapse")
    // batch twin with the same null keys: hashSplit routes nulls to b
    val batch = Sampling.hashSplit(
      (units.take(10).map { case (u, v) => (u, v) } ++
        Seq((null.asInstanceOf[String], 42L), (null.asInstanceOf[String], 17L)))
        .toDF("u", "v"), "u", Seq("a" -> 0.5, "b" -> 0.5), Salt)
    val expected = Inference.welchFromMoments(
      Inference.momentPartial(batch, Seq("split"), "v", decimalScale = 0),
      "split", "a", "b").collect().toSeq
    assert(a == expected, "null users must land exactly where batch hashSplit puts them")
  }
}
