package graft.sinks

import graft.operators.Rollup
import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-metrics-store WRITE path end to end: a stream's
  * micro-batches each append their own [[Rollup.partial]] as an IndexStore
  * generation (`foreachBatch` — one bounded keyed aggregation per batch,
  * nothing rescanned), and any reader at any time merges the generations
  * into the exact from-scratch rollup — integer sums make the merge
  * bit-exact regardless of how rows split across batches. Consolidation
  * rewrites N generations to one without changing a single value, so the
  * store can run forever at O(generations) files between compactions.
  */
class StreamingRollupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBatch partials appended as generations merge to the exact batch rollup") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-rollup").toString + "/gens"
    val rows = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("lang"), col("n_chars").cast("long").as("n_chars"))
      .as[(String, Long)].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val q = in.toDF().toDF("lang", "n_chars")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        IndexStore.append(Rollup.partial(batch, Seq("lang"), "n_chars"), dir)
        ()
      }
      .start()
    // three uneven micro-batches so generation boundaries cut group keys
    val (a, rest) = rows.splitAt(7)
    val (b, c) = rest.splitAt(19)
    Seq(a, b, c).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    q.stop()

    def fromStore = Rollup.finalize(
      Rollup.merge(Seq(IndexStore.read(spark, dir)), Seq("lang")))
      .orderBy(col("lang"))
    val expected = Rollup.finalize(
      Rollup.partial(rows.toDF("lang", "n_chars"), Seq("lang"), "n_chars"))
      .orderBy(col("lang")).collect().toSeq

    assert(fromStore.collect().toSeq == expected,
      "merged stream generations must equal the from-scratch rollup bit for bit")
    // consolidate: 3 generations -> 1, values unchanged
    val (gens, _) = IndexStore.consolidate(spark, dir)
    assert(gens == 3)
    assert(fromStore.collect().toSeq == expected,
      "consolidation must not change any metric")
  }
}
