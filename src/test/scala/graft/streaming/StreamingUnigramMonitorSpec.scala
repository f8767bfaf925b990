package graft.streaming

import graft.TestSpark
import graft.operators.UnigramLm
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming unigram monitor: the drained readout is bit-identical to
  * the batch transfer card's global totals, batch placement/replay
  * cannot change the cumulative sums, and null text counts as an empty
  * document on both sides. */
class StreamingUnigramMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = UnigramLm.fixedVocab(
    (('a' to 'z') ++ ('0' to '9')).map(c => c.toString -> -3000000L) ++
      Seq("th" -> -5500000L, "er" -> -5500000L),
    maxPieceLen = 2)

  private val docs: Seq[String] = Seq(
    "the weather theory", "other terms matter", "no special pieces here",
    null, "", "mother thinks further", "12th era", "thth erer onon")

  private def tuples(ds: Seq[String], seq0: Long): Seq[(Int, Long, String)] =
    ds.zipWithIndex.map { case (t, i) => (i % 3, seq0 + i, t) }

  private def drain(batches: Seq[Seq[(Int, Long, String)]], name: String): Seq[Row] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Int, Long, String)]
    val q = StreamingUnigramMonitor.stats(in.toDS(), vocab)
      .toDF("shard", "epoch", "n_docs", "n_words", "n_tokens", "score_micro")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  private def snapsDF(rows: Seq[Row]) =
    rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)))
      .toDF("shard", "epoch", "n_docs", "n_words", "n_tokens", "score_micro")

  private def batchCard: Row = {
    // the batch card over ONE group = the global totals
    UnigramLm.transferCard(
        docs.toDF("text").withColumn("g", lit(1)), "text", "g", vocab)
      .select(col("n_docs"), col("total_words"), col("total_tokens"),
        col("total_score_micro"), col("tokens_per_word"))
      .collect().head
  }

  test("3-micro-batch drained readout is bit-identical to the batch card (null text included)") {
    val all = tuples(docs, 0L)
    val rows = drain(Seq(all.take(3), all.slice(3, 6), all.drop(6)), "ug_drain")
    val got = StreamingUnigramMonitor.readout(snapsDF(rows)).collect().head
    assert(got == batchCard, s"drained readout diverged:\n$got\nvs\n$batchCard")
  }

  test("batch placement and replay cannot change the readout") {
    val all = tuples(docs, 0L)
    val a = StreamingUnigramMonitor.readout(snapsDF(drain(Seq(all), "ug_r1"))).collect().head
    val b = StreamingUnigramMonitor.readout(snapsDF(
      drain(Seq(all.take(1), all.slice(1, 2), all.drop(2)), "ug_r2"))).collect().head
    assert(a == b && a == batchCard)
  }
}
