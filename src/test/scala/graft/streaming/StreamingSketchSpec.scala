package graft.streaming

import graft.operators.{Dedup, Sketches}
import graft.sinks.IndexStore
import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch maintenance AT INGEST: every sketch in [[Sketches]] is a keyed
  * aggregation with bounded, associative + commutative state, so the SAME
  * call rides a readStream — cardinality (HLL/KMV) and membership (Bloom)
  * tracking update incrementally as micro-batches arrive, with state O(m)/
  * O(k) per group forever, no watermark needed (the sketches never grow
  * past their bound). Each test drains a static corpus across three uneven
  * micro-batches (so cross-batch state merging is actually exercised) in
  * COMPLETE output mode and requires the final snapshot to equal the batch
  * operator on the same data — not approximately: register-, hash- and
  * bit-identical.
  */
class StreamingSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docRows: Seq[(String, String)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("text")).as[(String, String)].collect().toSeq

  /** Drain `rows` through `build` in three uneven micro-batches, complete
    * mode; returns the final in-memory table. */
  private def drained(rows: Seq[(String, String)], name: String)(
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val q = build(in.toDF().toDF("source", "text"))
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      val (b1, rest) = rows.splitAt(rows.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  test("streaming HLL registers equal the batch registers after drain") {
    val rows = docRows
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(
        df.select(col("source"), explode(Dedup.shingles(col("text"))).as("sh")),
        Seq("source"), col("sh"), p = 6, salt = "shll")
    val streamed = drained(rows, "hll_stream")(regs)
    val batch = regs(rows.toDF("source", "text")).collect().toSeq
    assert(streamed.sortBy(_.toString) == batch.sortBy(_.toString))
    assert(streamed.nonEmpty)
  }

  test("streaming KMV sketch equals the batch sketch after drain") {
    val rows = docRows
    def kmv(df: org.apache.spark.sql.DataFrame) =
      Sketches.kmvSketch(
        df.select(col("source"), explode(Dedup.shingles(col("text"))).as("sh")),
        Seq("source"), col("sh"), k = 64, salt = "skmv")
    val streamed = drained(rows, "kmv_stream")(kmv)
    val batch = kmv(rows.toDF("source", "text")).collect().toSeq
    assert(streamed.sortBy(_.toString) == batch.sortBy(_.toString))
  }

  test("streaming Bloom bitmap equals the batch bitmap after drain") {
    val rows = docRows
    def bloom(df: org.apache.spark.sql.DataFrame) =
      Sketches.bloomSketch(df, col("text"), mBits = 1024, kHashes = 3, salt = "sbl")
    val streamed = drained(rows, "bloom_stream")(bloom)
    val batch = bloom(rows.toDF("source", "text")).collect().toSeq
    assert(streamed.sortBy(_.toString) == batch.sortBy(_.toString))
  }

  test("per-generation KMV sketches in the IndexStore merge to the whole-corpus sketch") {
    // the lifecycle story: each curation run appends its shard's sketch as
    // a generation; a roll-up reads ALL generations and merges — losslessly
    // for KMV — without ever rescanning the corpora.
    val dir = java.nio.file.Files.createTempDirectory("kmv-gens").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val k = 64
    def sketchOf(df: org.apache.spark.sql.DataFrame) =
      Sketches.kmvSketch(df.select(explode(Dedup.shingles(col("text"))).as("sh")),
        Seq.empty, col("sh"), k, salt = "gkmv")
    IndexStore.append(sketchOf(docs.filter(col("doc_id") % 2 === 0)), dir)
    IndexStore.append(sketchOf(docs.filter(col("doc_id") % 2 === 1)), dir)
    val merged = IndexStore.read(spark, dir)
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("kmv"))))), 1, k).as("kmv"))
      .as[Seq[Long]].head()
    val whole = sketchOf(docs).as[Seq[Long]].head()
    assert(merged == whole)
  }
}
