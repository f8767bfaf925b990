package graft.streaming

import graft.TestSpark
import graft.operators.{Experiment, Sampling}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming SRM monitor: drain ≡ batch abReadout bit-for-bit, hash
  * parity with the Column form, the SRM flag firing mid-stream on an
  * injected arm-selective loss, replay idempotence, and the null-user
  * contract (last arm, like batch hashSplit — never a poison pill). */
class StreamingSrmMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Salt = "exp1"

  /** Feeds batches through counts() into a memory sink, returning the
    * per-batch cumulative snapshot tables (one Seq[Row] per processed
    * prefix of the batch list). */
  private def drainPrefixes(
      batches: Seq[Seq[(Int, Long, String, Boolean)]],
      name: String): Seq[Seq[Row]] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Int, Long, String, Boolean)]
    val q = StreamingSrmMonitor.counts(in.toDS(), Salt)
      .toDF("shard", "epoch", "n_a", "n_b", "conv_a", "conv_b")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.map { b =>
        in.addData(b); q.processAllAvailable()
        spark.table(name).collect().toSeq
      }
    } finally q.stop()
  }

  private def readoutRows(snapshotRows: Seq[Row]): Seq[Row] = {
    val snaps = snapshotRows
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toDF("shard", "epoch", "n_a", "n_b", "conv_a", "conv_b")
    StreamingSrmMonitor.readout(snaps).collect().toSeq
  }

  test("keyHashLong equals Sampling.keyHash (Column form) on ASCII and non-ASCII keys") {
    val keys = Seq("user42", "", "a", "café", "日本語キー", "emoji🙂x",
      "0", "-17", String.valueOf(Long.MaxValue), "señor-Ωλ")
    val viaColumn = keys.toDF("k")
      .select(col("k"), Sampling.keyHash(col("k"), Salt).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      assert(StreamingSrmMonitor.keyHashLong(k, Salt) == viaColumn(k),
        s"hash mismatch on key '$k'")
      // and against the reference definition: first 15 hex chars base-16
      val hex = StreamingSrmMonitor.md5Hex(Salt + k)
      assert(StreamingSrmMonitor.keyHashLong(k, Salt) ==
        java.lang.Long.parseLong(hex.substring(0, 15), 16))
    }
  }

  test("keyHashLong property: equals the reference hex-parse definition on arbitrary unicode") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val unicodeStr = Gen.listOf(Gen.oneOf(
      Gen.asciiPrintableChar,
      Gen.choose(' ', '⓿'),
      Gen.choose('一', '鿿'))).map(_.mkString)
    val prop = Prop.forAll(Gen.asciiPrintableStr, unicodeStr) { (salt, key) =>
      StreamingSrmMonitor.keyHashLong(key, salt) ==
        java.lang.Long.parseLong(
          StreamingSrmMonitor.md5Hex(salt + key).substring(0, 15), 16)
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }

  test("3-micro-batch drain readout is bit-identical to batch abReadout over the same users") {
    // 60 users over 3 shards; conversion by a fixed residue so both arms
    // see converted and unconverted users
    val users = (1L to 60L).map(i => (s"u$i", i % 3 == 0))
    val stream = users.map { case (u, c) =>
      ((u.hashCode & Int.MaxValue) % 3, u.drop(1).toLong, u, c)
    }
    val prefixes = drainPrefixes(
      Seq(stream.take(20), stream.slice(20, 45), stream.drop(45)), "srm_fold")
    assert(prefixes.last.map(_.getLong(1)).max == 3L, "one epoch per micro-batch")

    val got = readoutRows(prefixes.last)
    val batchUsers = users.toDF("u", "converted")
    val expected = Experiment.abReadout(batchUsers, "u", "converted", Salt)
      .collect().toSeq
    assert(got == expected, s"drain ≠ batch:\n$got\nvs\n$expected")
    // sanity: both arms actually populated
    assert(got.head.getLong(0) > 0L && got.head.getLong(1) > 0L)
  }

  test("SRM flag fires mid-stream on an injected arm-selective loss") {
    // split a balanced population by its TRUE arm, then lose arm a's
    // second half — the ingestion failure mode the monitor exists for
    val boundary = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val all = (1L to 600L).map(i => s"v$i")
    val (armA, armB) = all.partition(u =>
      StreamingSrmMonitor.keyHashLong(u, Salt) < boundary)
    assert(armA.size >= 80 && armB.size >= 180, "need both arms populated")
    val healthy = (armA.take(80) ++ armB.take(80)).zipWithIndex
      .map { case (u, i) => (i % 2, i.toLong, u, false) }
    val lossy = armB.slice(80, 180).zipWithIndex // arm b only: selective loss
      .map { case (u, i) => (i % 2, (1000 + i).toLong, u, false) }
    val prefixes = drainPrefixes(Seq(healthy, lossy), "srm_flag")

    val mid = readoutRows(prefixes.head).head
    assert(!mid.getBoolean(mid.fieldIndex("srm_flag")),
      s"balanced prefix must not flag: $mid")
    val after = readoutRows(prefixes.last).head
    assert(after.getBoolean(after.fieldIndex("srm_flag")),
      s"arm-selective loss must flag: $after")
    assert(after.getLong(after.fieldIndex("n_b")) ==
      mid.getLong(mid.fieldIndex("n_b")) + 100L)
  }

  test("replay is idempotent and micro-batch placement cannot move the final counts") {
    val stream = (1L to 30L).map(i => ((i % 2).toInt, i, s"w$i", i % 4 == 0))
    def finalCounts(prefixes: Seq[Seq[Row]]): Map[Int, (Long, Long, Long, Long)] =
      prefixes.last.groupBy(_.getInt(0)).map { case (s, rs) =>
        val top = rs.maxBy(_.getLong(1))
        s -> ((top.getLong(2), top.getLong(3), top.getLong(4), top.getLong(5)))
      }
    val a = finalCounts(drainPrefixes(Seq(stream.take(11), stream.drop(11)), "srm_r1"))
    val b = finalCounts(drainPrefixes(Seq(stream.take(11), stream.drop(11)), "srm_r2"))
    val c = finalCounts(drainPrefixes(Seq(stream), "srm_r3"))
    assert(a == b, "same batches replayed must rebuild identical state")
    assert(a == c, "batch placement must not change cumulative counts")
  }

  test("stop/restart from checkpoint: state survives, the restarted drain reads out the full population") {
    import org.apache.spark.sql.streaming.Trigger
    val users = (1L to 40L).map(i => (s"c$i", i % 5 == 0))
    def tuples(us: Seq[(String, Boolean)], seq0: Long) = us.zipWithIndex.map {
      case ((u, c), i) => ((i % 2), seq0 + i, u, c)
    }
    val stage = java.nio.file.Files.createTempDirectory("graft-srm-ckpt-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-srm-ckpt").toString
    // the memory sink cannot recover from a checkpoint; the parquet file
    // sink is the recoverable one — the deployment shape anyway
    val out = java.nio.file.Files.createTempDirectory("graft-srm-ckpt-out").toString
    val schema = tuples(users, 0L).toDF("_1", "_2", "_3", "_4").schema
    def writeBatch(us: Seq[(String, Boolean)], seq0: Long): Unit =
      tuples(us, seq0).toDF("_1", "_2", "_3", "_4")
        .coalesce(1).write.mode("append").parquet(stage)

    def run(): Unit = {
      val in = spark.readStream.schema(schema).parquet(stage)
        .as[(Int, Long, String, Boolean)]
      val q = StreamingSrmMonitor.counts(in, Salt)
        .toDF("shard", "epoch", "n_a", "n_b", "conv_a", "conv_b")
        .writeStream.format("parquet").option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try { assert(q.awaitTermination(300000), "drain timed out") }
      finally q.stop()
    }
    def snapshots(): Seq[Row] = spark.read.parquet(out).collect().toSeq

    writeBatch(users.take(25), 0L)
    run()
    val mid = snapshots()
    assert(mid.nonEmpty && mid.map(_.getLong(1)).max >= 1L)

    // the monitor is DOWN while batch 2 lands; the restarted query must
    // resume from the checkpointed offsets + state, not re-count batch 1
    writeBatch(users.drop(25), 100L)
    run()
    val after = snapshots()
    assert(after.size > mid.size, "restart must process the new files")
    assert(after.map(_.getLong(1)).max > mid.map(_.getLong(1)).max,
      "epochs must CONTINUE from the checkpointed state, not restart at 1")
    val got = readoutRows(after)
    val expected = Experiment.abReadout(users.toDF("u", "converted"),
      "u", "converted", Salt).collect().toSeq
    assert(got == expected,
      s"checkpoint-resumed drain diverged from batch:\n$got\nvs\n$expected")
  }

  test("composition: per-epoch drained cuts feed msprtReadout — always-valid p over the live stream") {
    // the full continuous-experiment page: drain 3 micro-batches, build
    // the global cumulative cut at EVERY epoch (each shard's latest
    // snapshot <= e), and run the mixture-SPRT over those cuts — the
    // result must equal msprt over hand-built cumulative counts of the
    // same prefixes
    val users = (1L to 90L).map(i => (s"m$i", i % 4 == 0))
    val stream = users.zipWithIndex.map { case ((u, c), i) => (i % 2, i.toLong, u, c) }
    val batches = Seq(stream.take(30), stream.slice(30, 60), stream.drop(60))
    val prefixes = drainPrefixes(batches, "srm_compose")

    // global cut at epoch e from the drained snapshots: per shard take
    // the max-epoch row <= e, then long-sum across shards
    val allRows = prefixes.last
    val epochs = allRows.map(_.getLong(1)).distinct.sorted
    val cuts = epochs.map { e =>
      val perShard = allRows.filter(_.getLong(1) <= e)
        .groupBy(_.getInt(0)).values.map(_.maxBy(_.getLong(1)))
      (e,
        perShard.map(_.getLong(2)).sum, perShard.map(_.getLong(3)).sum,
        perShard.map(_.getLong(4)).sum, perShard.map(_.getLong(5)).sum)
    }.toDF("cut", "n_a", "n_b", "conv_a", "conv_b")
    val streamed = Experiment.msprtReadout(cuts, "cut", tau2 = 1e-4)
      .orderBy(org.apache.spark.sql.functions.col("cut")).collect().toSeq

    // ground truth: batch-assigned cumulative counts over the same prefixes
    val boundary = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val expected = Experiment.msprtReadout(
      batches.indices.map { i =>
        val seen = batches.take(i + 1).flatten
        val (a, b) = seen.partition(t =>
          t._3 != null && StreamingSrmMonitor.keyHashLong(t._3, Salt) < boundary)
        ((i + 1).toLong, a.size.toLong, b.size.toLong,
          a.count(_._4).toLong, b.count(_._4).toLong)
      }.toDF("cut", "n_a", "n_b", "conv_a", "conv_b"), "cut", tau2 = 1e-4)
      .orderBy(org.apache.spark.sql.functions.col("cut")).collect().toSeq
    assert(streamed == expected,
      s"streamed cuts diverged from batch cuts:\n$streamed\nvs\n$expected")
  }

  test("null users take the last arm exactly like batch hashSplit — no poison pill") {
    val named = Seq(("u1", true), ("u2", false), ("u3", true), ("u4", false))
    val stream = named.zipWithIndex.map { case ((u, c), i) => (0, i.toLong, u, c) } ++
      Seq((0, 98L, null.asInstanceOf[String], true),
        (0, 99L, null.asInstanceOf[String], false))
    val prefixes = drainPrefixes(Seq(stream), "srm_null")
    val got = readoutRows(prefixes.last)

    val batchUsers = (named.map { case (u, c) => (u, c) } ++
      Seq((null.asInstanceOf[String], true), (null.asInstanceOf[String], false)))
      .toDF("u", "converted")
    // batch ground truth: hashSplit routes null keys to the last label
    val split = Sampling.hashSplit(batchUsers, "u", Seq("a" -> 0.5, "b" -> 0.5), Salt)
    assert(split.filter(col("u").isNull && col("split") =!= "b").count() == 0L)
    val expected = Experiment.abReadout(batchUsers, "u", "converted", Salt)
      .collect().toSeq
    assert(got == expected, s"null handling diverged from batch:\n$got\nvs\n$expected")
  }
}
