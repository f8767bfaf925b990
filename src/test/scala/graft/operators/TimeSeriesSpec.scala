package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("resampleForwardFill: gaps carry the last value, grid spans min..max per key, no cross-key leakage") {
    // key A: events in buckets 0, 1, 4 (gap 2-3); key B: single bucket 7
    val rows = Seq(
      ("A", 5L, 10L), ("A", 8L, 11L),     // bucket 0 -> max 11
      ("A", 12L, 20L),                    // bucket 1
      ("A", 45L, 99L),                    // bucket 4
      ("B", 77L, 7L))                     // bucket 7
    val df = rows.toDF("k", "t", "v")
    val out = TimeSeries.resampleForwardFill(df, "k", "t", "v", bucketWidth = 10L)
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(
      ("A", 0L, 11L), ("A", 1L, 20L),
      ("A", 2L, 20L), ("A", 3L, 20L),     // forward-filled gap
      ("A", 4L, 99L),
      ("B", 7L, 7L)))                     // B's grid never inherits A's span or values
  }

  test("resampleForwardFill: negative timestamps bucket by floor division, not truncation") {
    val df = Seq(("k", -25L, 1L), ("k", 5L, 2L)).toDF("k", "t", "v")
    val out = TimeSeries.resampleForwardFill(df, "k", "t", "v", bucketWidth = 10L)
      .as[(String, Long, Long)].collect().map { case (_, b, v) => (b, v) }.toMap
    // floor(-25/10) = -3 (NOT -2): grid is -3..0 with the gap filled
    assert(out == Map(-3L -> 1L, -2L -> 1L, -1L -> 1L, 0L -> 2L))
  }
}
