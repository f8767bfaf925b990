package graft.sources

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The JDBC windowed source as a REAL MicroBatchStream: readStream over
  * embedded Derby, Trigger.AvailableNow drain, checkpointed resume picking
  * up only post-restart rows — the engine-native form of the epoch-runner
  * JDBC test (JdbcWindowedSourceSpec), driven by the offset log instead of
  * the commit log.
  */
class JdbcWindowedStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val url = "jdbc:derby:memory:graftstream;create=true"
  private val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  private def seed(table: String, ids: Range): Unit = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      val exists =
        try { st.executeQuery(s"SELECT 1 FROM $table WHERE 1=0"); true }
        catch { case _: java.sql.SQLException => false }
      if (!exists)
        st.execute(s"CREATE TABLE $table (ID INT PRIMARY KEY, NAME VARCHAR(32), MODIFIED_AT TIMESTAMP)")
      val ps = conn.prepareStatement(s"INSERT INTO $table VALUES (?, ?, ?)")
      ids.foreach { i =>
        ps.setInt(1, i)
        ps.setString(2, s"user-$i")
        ps.setTimestamp(3, new java.sql.Timestamp(base.getTime + i * 60000L)) // 1/minute
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
  }

  private def drop(table: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      try conn.createStatement().execute(s"DROP TABLE $table")
      catch { case _: java.sql.SQLException => () }
    } finally conn.close()
  }

  /** Read-back anchor (timezone-shift-proof, like the epoch-runner spec):
    * window options derived from what JDBC itself returns. */
  private def anchors(table: String): (java.time.Instant, java.time.Instant) = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT MIN(MODIFIED_AT), MAX(MODIFIED_AT) FROM $table")
      rs.next()
      (rs.getTimestamp(1).toInstant, rs.getTimestamp(2).toInstant)
    } finally conn.close()
  }

  private def drain(table: String, ckpt: String, sinkName: String, nowIso: String, from: java.time.Instant): Unit = {
    try spark.catalog.dropTempView(sinkName) catch { case _: Exception => () }
    val q = spark.readStream
      .format("graft.sources.JdbcWindowedTableProvider")
      .option("url", url)
      .option("table", table)
      .option("tsCol", "MODIFIED_AT")
      .option("from", from.toString)
      .option("stepMs", (7 * 60000L).toString) // 7 min: ragged against 1-row/min
      .option("numPartitions", "3")
      .option("now", nowIso)
      .load()
      .writeStream.format("memory").queryName(sinkName).outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(120000)) throw graft.core.GraftError("drain timed out")
    } finally q.stop()
  }

  test("AvailableNow drains every row exactly once across multiple windowed batches") {
    drop("SUSERS"); seed("SUSERS", 0 until 40)
    val (minTs, maxTs) = anchors("SUSERS")
    val ckpt = Files.createTempDirectory("graft-jw-ckpt").toString
    drain("SUSERS", ckpt, "jw_sink", maxTs.plusSeconds(86400).toString, minTs.minusSeconds(1))
    val ids = spark.table("jw_sink").select("ID").collect().map(_.getInt(0)).sorted.toSeq
    assert(ids == (0 until 40), "every row exactly once")
    // the offset log must show the window walking in multiple fold steps
    val offsets = new java.io.File(s"$ckpt/offsets").list()
    assert(offsets != null && offsets.length > 1, s"expected a multi-batch walk, got ${offsets.mkString(",")}")
  }

  test("checkpoint resume reads only rows that arrived after the first drain") {
    drop("RUSERS"); seed("RUSERS", 0 until 20)
    val (minTs, max1) = anchors("RUSERS")
    val ckpt = Files.createTempDirectory("graft-jw-resume-ckpt").toString
    val out = Files.createTempDirectory("graft-jw-resume-out").toString
    val from = minTs.minusSeconds(1)
    // the memory sink cannot recover a checkpoint; a file sink can
    def drainToParquet(nowIso: String): Unit = {
      val q = spark.readStream
        .format("graft.sources.JdbcWindowedTableProvider")
        .option("url", url).option("table", "RUSERS").option("tsCol", "MODIFIED_AT")
        .option("from", from.toString)
        .option("stepMs", (7 * 60000L).toString)
        .option("now", nowIso)
        .load()
        .writeStream.format("parquet").outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      try { assert(q.awaitTermination(120000)) } finally q.stop()
    }
    drainToParquet(max1.plusSeconds(86400).toString)
    assert(spark.read.parquet(out).count() == 20)

    seed("RUSERS", 20 until 35) // arrives "later"
    val (_, max2) = anchors("RUSERS")
    drainToParquet(max2.plusSeconds(86400).toString)
    val ids2 = spark.read.parquet(out).select("ID").collect().map(_.getInt(0)).sorted.toSeq
    assert(ids2 == (0 until 35), s"resume must append exactly the new rows once, got $ids2")
  }

  test("lag holds the frontier back: rows inside the lag horizon wait for the next run") {
    drop("LUSERS"); seed("LUSERS", 0 until 40)
    val (minTs, maxTs) = anchors("LUSERS")
    val ckpt = Files.createTempDirectory("graft-jw-lag-ckpt").toString
    try spark.catalog.dropTempView("jw_lag") catch { case _: Exception => () }
    // now = max ts, lag = 10 min: the last 10 minutes of rows are "too fresh"
    val q = spark.readStream
      .format("graft.sources.JdbcWindowedTableProvider")
      .option("url", url).option("table", "LUSERS").option("tsCol", "MODIFIED_AT")
      .option("from", minTs.minusSeconds(1).toString)
      .option("stepMs", (7 * 60000L).toString)
      .option("lagMs", (10 * 60000L).toString)
      .option("now", maxTs.toString)
      .load()
      .writeStream.format("memory").queryName("jw_lag").outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try { assert(q.awaitTermination(120000)) } finally q.stop()
    val ids = spark.table("jw_lag").select("ID").collect().map(_.getInt(0)).sorted.toSeq
    // rows 30..39 (within 10 min of now) are beyond the clamped frontier
    assert(ids == (0 until 30), s"lag horizon must exclude the fresh tail, got $ids")
  }

  test("offset json round-trips and partition slicing tiles the range exactly") {
    val off = WindowStreamOffset(123456789L, 987654321L)
    assert(WindowStreamOffset.fromJson(off.json()) == off)
    intercept[graft.core.GraftError](WindowStreamOffset.fromJson("""{"bad":1}"""))

    val config = JdbcWindowConfig(url, "SUSERS", "MODIFIED_AT", 0L, 1000L, 0L,
      numPartitions = 3, "", "", "", 5000, None)
    val stream = new JdbcWindowedMicroBatchStream(new org.apache.spark.sql.types.StructType(), config)
    val parts = stream.planInputPartitions(WindowStreamOffset(0L, 1000L), WindowStreamOffset(1000L, 2000L))
      .map(_.asInstanceOf[JdbcWindowPartition])
    assert(parts.length == 3)
    assert(parts.head.fromUs == 0L && parts.last.toUs == 1000L)
    assert(parts.sliding(2).forall { case Array(a, b) => a.toUs == b.fromUs })
    // degenerate 1-microsecond range: never more slices than microseconds
    val tiny = stream.planInputPartitions(WindowStreamOffset(0L, 10L), WindowStreamOffset(1L, 11L))
    assert(tiny.length == 1)
    // empty range: no partitions
    assert(stream.planInputPartitions(WindowStreamOffset(5L, 10L), WindowStreamOffset(5L, 20L)).isEmpty)
  }
}
