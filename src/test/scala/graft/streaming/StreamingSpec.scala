package graft.streaming

import graft.TestSpark
import graft.sinks.ExactlyOnceParquetWriter
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured-streaming semantics through real StreamingQuery executions
  * over MemoryStream: watermark window finalization, late-data drop,
  * streaming dedup, keyed running state, and exactly-once foreachBatch.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling watermark windows finalize in append mode and drop late rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = Streams.tumblingCounts(
      input.toDF.toDF("ts", "k"), "ts", "10 minutes", "5 minutes", col("k"))
    val q = counts.writeStream.format("memory").queryName("tumbling_sink")
      .outputMode("append").start()
    try {
      input.addData((ts("2026-01-01 10:01:00"), "a"), (ts("2026-01-01 10:02:00"), "a"))
      q.processAllAvailable()
      // window [10:00,10:10) not finalized yet -> nothing emitted
      assert(spark.table("tumbling_sink").count() == 0)
      // advance watermark beyond 10:10 + 5m delay
      input.addData((ts("2026-01-01 10:20:00"), "b"))
      q.processAllAvailable()
      val rows = spark.table("tumbling_sink").as[(Timestamp, String, Long)].collect().toSet
      assert(rows == Set((ts("2026-01-01 10:00:00"), "a", 2L)))
      // a late row behind the watermark must NOT resurrect the closed window
      input.addData((ts("2026-01-01 10:03:00"), "a"))
      input.addData((ts("2026-01-01 10:40:00"), "c")) // push watermark further
      q.processAllAvailable()
      val after = spark.table("tumbling_sink").as[(Timestamp, String, Long)].collect().toSet
      assert(!after.exists { case (b, k, c) => b == ts("2026-01-01 10:00:00") && k == "a" && c != 2L })
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes in-horizon duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val dedup = Streams.dedupWithinWatermark(
      input.toDF.toDF("ts", "id"), "ts", "10 minutes", "id")
    val q = dedup.writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2026-01-01 10:00:00"), "x"),
        (ts("2026-01-01 10:01:00"), "x"), // dup within horizon
        (ts("2026-01-01 10:02:00"), "y"))
      q.processAllAvailable()
      val ids = spark.table("dedup_sink").select("id").as[String].collect().toSeq
      assert(ids.sorted == Seq("x", "y"))
    } finally q.stop()
  }

  test("runningAggregate carries keyed state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val agg = Streams.runningAggregate(input.toDS())
    val q = agg.toDF("k", "cnt", "sum").writeStream.format("memory")
      .queryName("state_sink").outputMode("update").start()
    try {
      input.addData(("u1", 10L), ("u1", 5L), ("u2", 1L))
      q.processAllAvailable()
      input.addData(("u1", 1L))
      q.processAllAvailable()
      val latest = spark.table("state_sink").as[(String, Long, Long)].collect()
        .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2) }
      assert(latest("u1") == (("u1", 3L, 16L))) // state carried: 2+1 rows, 15+1 sum
      assert(latest("u2") == (("u2", 1L, 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join matches within the lookback and prunes state via watermarks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, String, String)]
    val imps = MemoryStream[(Timestamp, String, String)]
    val joined = Streams.intervalJoin(
      clicks.toDF.toDF("cts", "k", "click"),
      imps.toDF.toDF("its", "k", "imp"),
      keyCol = "k", leftTs = "cts", rightTs = "its",
      lookback = "10 minutes", watermarkDelay = "5 minutes")
    val q = joined.select("click", "imp").writeStream
      .format("memory").queryName("join_sink").outputMode("append").start()
    try {
      imps.addData((ts("2026-01-01 10:00:00"), "u1", "i1"))
      imps.addData((ts("2026-01-01 09:40:00"), "u1", "i0")) // outside 10m lookback of the click
      clicks.addData((ts("2026-01-01 10:05:00"), "u1", "c1"))
      q.processAllAvailable()
      // advance both watermarks so the pair finalizes
      imps.addData((ts("2026-01-01 11:00:00"), "zz", "iz"))
      clicks.addData((ts("2026-01-01 11:00:00"), "zz", "cz"))
      q.processAllAvailable()
      val rows = spark.table("join_sink").as[(String, String)].collect().toSet
      assert(rows.contains(("c1", "i1")))
      assert(!rows.contains(("c1", "i0"))) // outside the interval
    } finally q.stop()
  }

  test("transformWithState (state API v2) folds per-key state across micro-batches on RocksDB") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(String, Long)]
      val q = Streams.runningFoldV2(input.toDS())
        .writeStream.format("memory").queryName("tws_sink").outputMode("update").start()
      try {
        input.addData(("u1", 5L), ("u1", 10L), ("u2", 1L))
        q.processAllAvailable()
        input.addData(("u1", 1L))
        q.processAllAvailable()
        val latest = spark.table("tws_sink").as[(String, Long, Long)].collect()
          .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
        assert(latest("u1") == (("u1", 3L, 16L))) // state carried: 2+1 rows, 15+1 sum
        assert(latest("u2") == (("u2", 1L, 1L)))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("sessionAggregate: gap semantics, bounds, exact sums (batch mode)") {
    val df = Seq(
      ("u1", ts("2026-01-01 10:00:00"), 1.5),
      ("u1", ts("2026-01-01 10:30:00"), 2.5),  // within 1h gap -> same session
      ("u1", ts("2026-01-01 11:30:00"), 4.0),  // exactly 1h after previous -> adjacent windows MERGE
      ("u1", ts("2026-01-01 12:30:01"), 0.5),  // 1h + 1s after previous -> new session
      ("u2", ts("2026-01-01 09:00:00"), 10.0)
    ).toDF("user_id", "ts", "value")
    val out = Streams.sessionAggregate(df, "user_id", "ts", "value", "1 hour")
      .orderBy("user_id", "session_start")
      .as[(String, Timestamp, Timestamp, Int, Double)].collect().toSeq
    assert(out == Seq(
      ("u1", ts("2026-01-01 10:00:00"), ts("2026-01-01 12:30:00"), 3, 8.0),
      ("u1", ts("2026-01-01 12:30:01"), ts("2026-01-01 13:30:01"), 1, 0.5),
      ("u2", ts("2026-01-01 09:00:00"), ts("2026-01-01 10:00:00"), 1, 10.0)))
  }

  test("exactly-once writer: replayed batch id is skipped, partial write is overwritten") {
    val dir = Files.createTempDirectory("graft-eo").toString
    val w = new ExactlyOnceParquetWriter(dir)
    val a = Seq(1, 2, 3).toDF("n")
    val b = Seq(99).toDF("n")
    w.write(a, 0)
    w.write(b, 0) // replay with different data: must be ignored
    assert(spark.read.parquet(s"$dir/batch=0").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    // crash-before-commit: data present, no marker -> rewrite wins
    b.write.mode("overwrite").parquet(s"$dir/batch=1")
    w.write(a, 1)
    assert(spark.read.parquet(s"$dir/batch=1").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("exactly-once writer behind a real foreachBatch streaming query") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-eo-stream").toString
    val w = new ExactlyOnceParquetWriter(dir)
    val input = MemoryStream[Int]
    val q = input.toDF.writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) => w.write(df, id))
      .option("checkpointLocation", s"$dir/_ckpt")
      .start()
    try {
      input.addData(1, 2, 3)
      q.processAllAvailable()
      input.addData(4, 5)
      q.processAllAvailable()
      val all = spark.read.parquet(s"$dir/batch=*").as[Int].collect().sorted.toSeq
      assert(all == Seq(1, 2, 3, 4, 5))
    } finally q.stop()
  }
}
