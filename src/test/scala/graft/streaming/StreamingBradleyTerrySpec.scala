package graft.streaming

import graft.TestSpark
import graft.operators.Experiment
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Bradley–Terry: the 3-micro-batch drained fit is
  * bit-identical to the batch MM fit over the same duels, batch
  * placement and replay cannot change the merged counts, null-keyed
  * duels are dropped (never a poison pill), and checkpoint restart
  * resumes the pair-count state instead of re-counting. */
class StreamingBradleyTerrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // duels over 4 items with a clear strength order and some upsets
  private val duels: Seq[(String, String)] =
    (1 to 24).map(i => ("alpha", "beta")) ++
      (1 to 8).map(_ => ("beta", "alpha")) ++
      (1 to 18).map(_ => ("beta", "gamma")) ++
      (1 to 6).map(_ => ("gamma", "beta")) ++
      (1 to 14).map(_ => ("gamma", "delta")) ++
      (1 to 4).map(_ => ("delta", "gamma")) ++
      (1 to 10).map(_ => ("alpha", "gamma")) ++
      (1 to 3).map(_ => ("delta", "alpha"))

  private def tuples(ds: Seq[(String, String)], seq0: Long): Seq[(Int, Long, String, String)] =
    ds.zipWithIndex.map { case ((w, l), i) => (i % 3, seq0 + i, w, l) }

  /** Drain batch lists through pairCounts into a memory sink; returns the
    * full snapshot table after all batches. */
  private def drain(batches: Seq[Seq[(Int, Long, String, String)]], name: String): Seq[Row] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Int, Long, String, String)]
    val q = StreamingBradleyTerry.pairCounts(in.toDS())
      .toDF("shard", "epoch", "winner", "loser", "n")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  private def snapsDF(rows: Seq[Row]) =
    rows.map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toDF("shard", "epoch", "winner", "loser", "n")

  test("3-micro-batch drained fit is bit-identical to the batch MM fit") {
    val all = tuples(duels, 0L)
    val rows = drain(Seq(all.take(30), all.slice(30, 60), all.drop(60)), "bt_drain")
    val got = StreamingBradleyTerry.fitFromDrained(snapsDF(rows), iterations = 8)
      .orderBy("item").collect().toSeq
    val want = Experiment.bradleyTerry(duels.toDF("winner", "loser"),
      "winner", "loser", iterations = 8).orderBy("item").collect().toSeq
    assert(got == want, s"drained fit diverged:\n$got\nvs\n$want")
    // the ranking the fixture plants: alpha > beta > gamma > delta
    val strengths = got.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(strengths("alpha") > strengths("beta") &&
      strengths("beta") > strengths("gamma") &&
      strengths("gamma") > strengths("delta"))
  }

  test("merged counts equal the batch pair counts regardless of batch placement or replay") {
    val all = tuples(duels, 0L)
    def merged(rows: Seq[Row]): Map[(String, String), Long] =
      StreamingBradleyTerry.mergedCounts(snapsDF(rows)).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val a = merged(drain(Seq(all), "bt_r1"))
    val b = merged(drain(Seq(all.take(7), all.slice(7, 11), all.drop(11)), "bt_r2"))
    val c = merged(drain(Seq(all.take(40), all.drop(40), all.take(0)), "bt_r3"))
    val batch = duels.groupBy(identity).map { case ((w, l), xs) => (w, l) -> xs.size.toLong }
    assert(a == batch && b == batch && c == batch)
  }

  test("null-keyed duels are dropped, not a poison pill") {
    val dirty: Seq[(Int, Long, String, String)] =
      Seq((0, 0L, "x", "y"), (0, 1L, null, "y"), (0, 2L, "x", null), (0, 3L, "x", "y"))
    val rows = drain(Seq(dirty), "bt_nulls")
    val m = StreamingBradleyTerry.mergedCounts(snapsDF(rows)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(("x", "y") -> 2L))
  }

  test("stop/restart from checkpoint: pair-count state survives, the resumed fit sees all duels") {
    import org.apache.spark.sql.streaming.Trigger
    val stage = java.nio.file.Files.createTempDirectory("graft-bt-ckpt-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bt-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-bt-ckpt-out").toString
    val all = tuples(duels, 0L)
    val schema = all.toDF("_1", "_2", "_3", "_4").schema
    def writeBatch(b: Seq[(Int, Long, String, String)]): Unit =
      b.toDF("_1", "_2", "_3", "_4").coalesce(1).write.mode("append").parquet(stage)
    def run(): Unit = {
      val in = spark.readStream.schema(schema).parquet(stage)
        .as[(Int, Long, String, String)]
      val q = StreamingBradleyTerry.pairCounts(in)
        .toDF("shard", "epoch", "winner", "loser", "n")
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try { assert(q.awaitTermination(300000), "drain timed out") }
      finally q.stop()
    }
    try {
      writeBatch(all.take(45)); run()
      val mid = spark.read.parquet(out).collect().toSeq
      assert(mid.nonEmpty)
      // monitor DOWN while batch 2 lands; resume must continue, not recount
      writeBatch(all.drop(45)); run()
      val after = spark.read.parquet(out).collect().toSeq
      assert(after.map(_.getLong(1)).max > mid.map(_.getLong(1)).max,
        "epochs must continue from checkpointed state")
      val got = StreamingBradleyTerry.fitFromDrained(
          spark.read.parquet(out), iterations = 8)
        .orderBy("item").collect().toSeq
      val want = Experiment.bradleyTerry(duels.toDF("winner", "loser"),
        "winner", "loser", iterations = 8).orderBy("item").collect().toSeq
      assert(got == want, s"checkpoint-resumed fit diverged:\n$got\nvs\n$want")
    } finally Seq(stage, ckpt, out).foreach(graft.queries.PackShared.deleteRecursively)
  }

  test("hard stop MID-DRAIN: killed right after the first commit, the resume is exactly-once") {
    // q333 (drainStagedResumed) restarts BETWEEN legs — deterministic by
    // design. This test covers the remaining axis: the stop fires the
    // moment the FIRST commit of a 24-file drain is observable, so it
    // lands while later micro-batches are still in flight and the killed
    // attempt may die mid-batch. The file sink's metadata log must never
    // expose a partial batch and the resumed run must neither skip nor
    // recount — the fit-equality assertion at the end proves both (a
    // lost file shifts the merged counts; a recount shifts them too).
    import org.apache.spark.sql.streaming.Trigger
    val stage = java.nio.file.Files.createTempDirectory("graft-bt-kill-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bt-kill-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-bt-kill-out").toString
    val all = tuples(duels, 0L)
    val df = all.toDF("_1", "_2", "_3", "_4")
    def start() = {
      val in = spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
        .as[(Int, Long, String, String)]
      StreamingBradleyTerry.pairCounts(in)
        .toDF("shard", "epoch", "winner", "loser", "n")
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
    }
    try {
      df.repartition(24).write.mode("overwrite").parquet(stage)
      val q1 = start()
      // stop from the main thread the moment ONE committed batch is
      // observable — no listener-bus lag; the stop lands while later
      // micro-batches are in flight (24 one-file batches)
      val deadline = System.nanoTime() + 300L * 1000000000L
      while (q1.isActive && q1.recentProgress.forall(_.numInputRows == 0) &&
          System.nanoTime() < deadline) Thread.sleep(20)
      q1.stop()
      q1.awaitTermination(300000)
      val committed = spark.read.parquet(out).count()
      // resume: a fresh query drains whatever the killed one left
      val q2 = start()
      try { assert(q2.awaitTermination(300000), "resume drain timed out") }
      finally q2.stop()
      val snaps = spark.read.parquet(out)
      // the stop is a race by nature (the killed run may have gotten
      // further than one batch); what must hold REGARDLESS is that the
      // kill lost nothing and the resume duplicated nothing
      assert(committed > 0, "the killed run must have committed at least one batch")
      assert(snaps.count() >= committed, "the resume lost committed rows")
      assert(snaps.count() > committed || !q2.recentProgress.exists(_.numInputRows > 0),
        "the resume processed rows without growing the sink")
      // exactly-once at the row level: no snapshot row delivered twice
      assert(snaps.groupBy("shard", "epoch", "winner", "loser")
        .count().filter(col("count") > 1).isEmpty,
        "metadata log exposed a duplicated snapshot row")
      val got = StreamingBradleyTerry.fitFromDrained(snaps, iterations = 8)
        .orderBy("item").collect().toSeq
      val want = Experiment.bradleyTerry(duels.toDF("winner", "loser"),
        "winner", "loser", iterations = 8).orderBy("item").collect().toSeq
      assert(got == want, s"kill-resumed fit diverged:\n$got\nvs\n$want")
    } finally Seq(stage, ckpt, out).foreach(graft.queries.PackShared.deleteRecursively)
  }
}
