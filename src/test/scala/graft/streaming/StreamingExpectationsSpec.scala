package graft.streaming

import graft.TestSpark
import graft.operators.Profiler
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Streaming contract monitor: drained report ≡ batch expectationReport
  * bit-for-bit over the same rows (the O(1)-statistic kinds), replay
  * and placement invariance, and the fail-closed all-null contract. */
class StreamingExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Rules = Seq(("min_ge", 0.0), ("max_le", 50.0), ("null_frac_le", 0.2))

  private def drain(batches: Seq[Seq[(Int, Long, Option[Double])]],
      name: String): Seq[Row] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Int, Long, Option[Double])]
    val q = StreamingExpectations.stats(in.toDS())
      .toDF("shard", "epoch", "n", "nulls", "min", "max")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  private def reportOf(rows: Seq[Row]): Seq[Row] = {
    val snaps = rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)),
      if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toDF("shard", "epoch", "n", "nulls", "min", "max")
    StreamingExpectations.report(snaps, "v", Rules).orderBy("kind").collect().toSeq
  }

  // injected: one out-of-range value (55.5 breaches max_le 50) and 30% nulls
  private val values: Seq[Option[Double]] =
    (1 to 100).map(i => if (i % 10 < 3) None else Some((i % 50) + 0.25)) :+ Some(55.5)

  test("3-micro-batch drain report is bit-identical to the batch battery on the same rows") {
    val stream = values.zipWithIndex.map { case (v, i) => (i % 3, i.toLong, v) }
    val got = reportOf(drain(
      Seq(stream.take(40), stream.slice(40, 80), stream.drop(80)), "exp_fold"))
    val expected = Profiler.expectationReport(
      values.toDF("v"), Rules.map { case (k, b) => ("v", k, b) })
      .orderBy(col("kind")).collect().toSeq
    assert(got == expected, s"drain ≠ batch:\n$got\nvs\n$expected")
    val byKind = got.map(r => r.getString(1) -> r.getBoolean(4)).toMap
    assert(byKind("min_ge") && !byKind("max_le") && !byKind("null_frac_le"),
      s"planted breach pattern must surface: $got")
  }

  test("replayed max-epoch snapshots and shard/batch placement cannot move the report") {
    val one = values.zipWithIndex.map { case (v, i) => (0, i.toLong, v) }
    val four = values.zipWithIndex.map { case (v, i) => (i % 4, i.toLong, v) }
    val a = reportOf(drain(Seq(one), "exp_a"))
    val snapsB = drain(Seq(four.take(11), four.drop(11)), "exp_b")
    val maxE = snapsB.map(_.getLong(1)).max
    val b = reportOf(snapsB ++ snapsB.filter(_.getLong(1) == maxE)) // duplicate delivery
    assert(a == b)
  }

  test("all-null stream fails range rules closed, reports the null fraction") {
    val allNull = (1 to 10).map(i => (0, i.toLong, None: Option[Double]))
    val got = reportOf(drain(Seq(allNull), "exp_null"))
    val byKind = got.map(r => r.getString(1) ->
      ((Option(r.get(3)), r.getBoolean(4)))).toMap
    assert(byKind("min_ge") == ((None, false)))
    assert(byKind("max_le") == ((None, false)))
    assert(byKind("null_frac_le") == ((Some(1.0), false)))
    intercept[IllegalArgumentException](
      StreamingExpectations.report(
        Seq((0, 1L, 1L, 0L, Some(1.0), Some(1.0)))
          .toDF("shard", "epoch", "n", "nulls", "min", "max"),
        "v", Seq(("distinct_ge", 1.0))))
  }
}
