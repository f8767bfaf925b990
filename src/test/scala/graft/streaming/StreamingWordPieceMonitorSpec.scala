package graft.streaming

import graft.TestSpark
import graft.operators.WordPiece
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming WordPiece coverage monitor: the drained readout is
  * bit-identical to the batch coverage card's global totals, batch
  * placement/replay cannot change the cumulative sums, and null text
  * counts as an empty document on both sides. */
class StreamingWordPieceMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // gapped alphabet (no q/x/z) -> real UNKs in the fixture
  private val chars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    .filterNot(Set("q", "x", "z"))
  private val vocab = WordPiece.fixedVocab(
    initial = chars ++ Seq("th", "er", "on"),
    continuation = chars ++ Seq("th", "er", "on"), maxPieceLen = 2)

  private val docs: Seq[String] = Seq(
    "the weather theory", "quartz boxes zigzag", "no special pieces here",
    null, "", "mother thinks quietly", "12th era", "exact zebra on the lawn")

  private def tuples(ds: Seq[String], seq0: Long): Seq[(Int, Long, String)] =
    ds.zipWithIndex.map { case (t, i) => (i % 3, seq0 + i, t) }

  private def drain(batches: Seq[Seq[(Int, Long, String)]], name: String): Seq[Row] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Int, Long, String)]
    val q = StreamingWordPieceMonitor.stats(in.toDS(), vocab)
      .toDF("shard", "epoch", "n_docs", "n_words", "n_tokens", "n_unk_words")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  private def snapsDF(rows: Seq[Row]) =
    rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)))
      .toDF("shard", "epoch", "n_docs", "n_words", "n_tokens", "n_unk_words")

  private def batchCard: Row =
    WordPiece.coverageCard(
        docs.toDF("text").withColumn("g", lit(1)), "text", "g", vocab)
      .select(col("n_docs"), col("total_words"), col("total_tokens"),
        col("total_unk_words"), col("unk_rate"))
      .collect().head

  test("3-micro-batch drained readout is bit-identical to the batch coverage card") {
    val all = tuples(docs, 0L)
    val rows = drain(Seq(all.take(3), all.slice(3, 6), all.drop(6)), "wp_drain")
    val got = StreamingWordPieceMonitor.readout(snapsDF(rows)).collect().head
    assert(got == batchCard, s"drained readout diverged:\n$got\nvs\n$batchCard")
    // the fixture actually exercises UNKs (quartz/boxes/zigzag/...)
    assert(got.getLong(3) >= 5L)
  }

  test("batch placement and replay cannot change the readout") {
    val all = tuples(docs, 0L)
    val a = StreamingWordPieceMonitor.readout(snapsDF(drain(Seq(all), "wp_r1"))).collect().head
    val b = StreamingWordPieceMonitor.readout(snapsDF(
      drain(Seq(all.take(1), all.slice(1, 2), all.drop(2)), "wp_r2"))).collect().head
    assert(a == b && a == batchCard)
  }
}
