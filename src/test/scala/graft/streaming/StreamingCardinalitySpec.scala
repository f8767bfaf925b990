package graft.streaming

import graft.TestSpark
import graft.operators.{Sampling, Sketches}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming cardinality contract: the drained merged KMV sketch is
  * bit-identical to the batch kmvSketch aggregator over the same rows
  * (shared-finishing-expression discipline), the unfilled sketch is the
  * EXACT distinct count with `estimated = false`, and replayed
  * max-epoch snapshots cannot move the report. */
class StreamingCardinalitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Salt = "card-spec"
  private val K = 16

  private def drain(batches: Seq[Seq[(Int, Long, Long)]], k: Int,
      name: String): Seq[Row] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Int, Long, Long)]
    val q = StreamingCardinality.kmvSketches(in.toDS(), k)
      .toDF("shard", "epoch", "kmv")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  private def snapsDF(rows: Seq[Row]) =
    rows.map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2)))
      .toDF("shard", "epoch", "kmv")

  /** keyHash values for elements, computed through the SAME Column
    * expression the batch sketch uses. */
  private def hashes(elems: Seq[String]): Seq[Long] =
    elems.toDF("e").select(Sampling.keyHash(col("e"), Salt)).as[Long].collect().toSeq

  test("drained merged sketch == batch kmvSketch over the same rows (filled, estimator path)") {
    val elems = (1 to 200).map(i => s"elem-${i % 120}") // 120 distinct, k=16 fills
    val hs = hashes(elems)
    val stream = hs.zipWithIndex.map { case (h, i) => (i % 3, i.toLong, h) }
    val snaps = drain(Seq(stream.take(70), stream.slice(70, 140), stream.drop(140)),
      K, "card_fill")
    // batch sketch over the same elements
    val batch = Sketches.kmvSketch(elems.toDF("e"), Seq.empty, col("e"), K, Salt)
      .select(col("kmv")).as[Seq[Long]].head()
    // merged drained sketch re-derived the way the report merges
    val merged = snapsDF(snaps)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
          .orderBy(col("epoch").desc)))
      .filter(col("__rn") === 1)
      .agg(flatten(collect_list(col("kmv"))).as("all"))
      .select(slice(array_sort(array_distinct(col("all"))), 1, K).as("kmv"))
      .as[Seq[Long]].head()
    assert(merged == batch, "drained merge must equal the batch aggregator's sketch")
    // and the report's observed equals the batch estimate on the same grid
    val rpt = StreamingCardinality.distinctReport(snapsDF(snaps), "e",
      Seq(("distinct_ge", 100.0), ("distinct_le", 1000.0)), K).collect()
    val est = spark.range(1).select(
      graft.functions.Quantize.scaledFloor(
        Sketches.kmvDistinct(typedLit(batch), K), 6)).as[Double].head()
    assert(rpt.forall(_.getDouble(3) == est))
    assert(rpt.forall(_.getBoolean(5)), "filled sketch must be flagged estimated")
  }

  test("unfilled sketch: observed is the EXACT distinct count, estimated = false") {
    val elems = (1 to 50).map(i => s"x-${i % 9}") // 9 distinct < k=16
    val hs = hashes(elems)
    val stream = hs.zipWithIndex.map { case (h, i) => (i % 2, i.toLong, h) }
    val snaps = drain(Seq(stream.take(25), stream.drop(25)), K, "card_exact")
    val rpt = StreamingCardinality.distinctReport(snapsDF(snaps), "e",
      Seq(("distinct_ge", 9.0), ("distinct_le", 8.0)), K).collect()
    val byKind = rpt.map(r => r.getString(1) ->
      ((r.getDouble(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(byKind("distinct_ge") == ((9.0, true, false)))
    assert(byKind("distinct_le") == ((9.0, false, false)))
  }

  test("replayed max-epoch snapshots and shard placement cannot move the report") {
    val hs = hashes((1 to 90).map(i => s"r-$i"))
    val one = hs.zipWithIndex.map { case (h, i) => (0, i.toLong, h) }
    val four = hs.zipWithIndex.map { case (h, i) => (i % 4, i.toLong, h) }
    val rules = Seq(("distinct_ge", 50.0))
    val a = StreamingCardinality.distinctReport(
      snapsDF(drain(Seq(one), K, "card_a")), "e", rules, K).collect().toSeq
    val snapsB = drain(Seq(four.take(31), four.drop(31)), K, "card_b")
    val maxE = snapsB.map(_.getLong(1)).max
    val b = StreamingCardinality.distinctReport(
      snapsDF(snapsB ++ snapsB.filter(_.getLong(1) == maxE)), // duplicate delivery
      "e", rules, K).collect().toSeq
    assert(a == b)
  }

  test("no snapshots fails closed; unknown kind is rejected") {
    val empty = Seq.empty[(Int, Long, Seq[Long])].toDF("shard", "epoch", "kmv")
    val rpt = StreamingCardinality.distinctReport(empty, "e",
      Seq(("distinct_ge", 1.0)), K).collect()
    assert(rpt.length == 1 && rpt.head.isNullAt(3) && !rpt.head.getBoolean(4))
    intercept[IllegalArgumentException](
      StreamingCardinality.distinctReport(empty, "e", Seq(("min_ge", 1.0)), K))
  }
}
