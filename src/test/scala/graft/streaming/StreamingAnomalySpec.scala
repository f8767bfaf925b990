package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Cumulative z-score at ingest: exact hand-computed baselines, state
  * carried across micro-batches, leakage-free scoring. */
class StreamingAnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def drain(batches: Seq[Seq[(Long, Long, Double)]], name: String) = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, Double)]
    val q = StreamingAnomaly.cumulativeZScore(in.toDS(), threshold = 2.0)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name)
        .as[(Long, Long, Double, Option[Double], Boolean)].collect().toSeq
        .sortBy(t => (t._1, t._2))
    } finally q.stop()
  }

  test("hand-exact baselines: first two events null, third scores against {1,3} exactly") {
    // prior {1, 3}: mean 2, population sd 1 -> value 5 scores z = 3, flagged
    val rows = Seq((1L, 1L, 1.0), (1L, 2L, 3.0), (1L, 3L, 5.0), (2L, 1L, 9.0))
    val got = drain(Seq(rows), "anomaly_one")
    assert(got == Seq(
      (1L, 1L, 1.0, None, false),
      (1L, 2L, 3.0, None, false),
      (1L, 3L, 5.0, Some(3.0), true),
      (2L, 1L, 9.0, None, false)))
  }

  test("state carries across micro-batches: three-batch drain equals one-batch drain") {
    val rows = (1L to 30L).map(i => (i % 3, i, (i * 7 % 11).toDouble)).toSeq
    val whole = drain(Seq(rows), "anomaly_whole")
    val split = drain(Seq(rows.take(10), rows.slice(10, 20), rows.drop(20)), "anomaly_split")
    assert(whole == split)
  }

  test("zero-variance history never scores (no division blowup)") {
    val rows = Seq((1L, 1L, 5.0), (1L, 2L, 5.0), (1L, 3L, 5.0), (1L, 4L, 99.0))
    val got = drain(Seq(rows), "anomaly_const")
    assert(got.forall(_._4.isEmpty), s"constant history must stay null: $got")
  }

  private def drainEwma(batches: Seq[Seq[(Long, Long, Double)]], name: String) = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, Double)]
    val q = StreamingAnomaly.streamingEwma(in.toDS(), alpha = 0.25)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).as[(Long, Long, Double, Double)].collect().toSeq
        .sortBy(t => (t._1, t._2))
    } finally q.stop()
  }

  test("streaming EWMA: in-order multi-batch drain equals the batch fold value for value") {
    import org.apache.spark.sql.functions._
    val rows = (1L to 60L).map(i => (i % 4, i, (i * 13 % 17).toDouble)).toSeq
    val streamed = drainEwma(Seq(rows.take(17), rows.slice(17, 40), rows.drop(40)), "ewma_split")
    val batch = graft.operators.TimeSeries.ewmaByKey(
      rows.toDF("k", "seq", "value"), "k", Seq("seq"), "value", alpha = 0.25)
      .select(col("k"), col("seq"), col("value"), col("ewma"))
      .as[(Long, Long, Double, Double)].collect().toSeq.sortBy(t => (t._1, t._2))
    assert(streamed == batch,
      "a per-key in-order drain must reproduce TimeSeries.ewmaByKey exactly")
  }
}
