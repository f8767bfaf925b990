package graft.examples

import graft.TestSpark
import graft.operators.{Dedup, TextAnalysis}
import graft.sinks.ExactlyOnceParquetWriter
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming curation composition must drain a multi-batch corpus to the
  * batch pipeline's survivor set: survivors at exact-dedup granularity
  * (gates + first-arrival exact dedup + redaction ≡ gates + min-id exact
  * dedup + redaction when arrival order is id order), and after the
  * downstream batch resolve (verify → CC → keep-min over the drained
  * candidate stream) the near-dup-level set too — modulo the documented
  * batch-only CC step being exactly that resolve.
  */
class StreamingCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("multi-batch drain + batch resolve equals the batch pipeline; replay adds nothing") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
    val originals = docs.as[(Long, String)].collect().sortBy(_._1).toSeq
    // plant exact duplicates of three GATE-SURVIVING documents with higher
    // ids in LATER feed batches — first arrival (the original, lower id)
    // must win, matching the batch form's min-id representative
    val gatedIds = TrainingDataPipeline.gates(docs)
      .select("doc_id").as[Long].collect().sorted.take(3)
    val copies = originals.filter(d => gatedIds.contains(d._1))
      .map { case (id, text) => (id + 100000L, text) }
    assert(copies.size == 3, "need three gate-surviving docs to clone")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val streams = StreamingCuration.curate(in.toDF().toDF("doc_id", "text"))

    val out = Files.createTempDirectory("graft-scur-out").toString
    val writer = new ExactlyOnceParquetWriter(out)
    val qSurv = streams.survivors.writeStream
      .foreachBatch(writer.write _)
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-ckpt").toString)
      .start()
    try spark.catalog.dropTempView("scur_cands") catch { case _: Exception => () }
    val qCand = streams.candidates.writeStream
      .format("memory").queryName("scur_cands").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-scur-cckpt").toString)
      .start()
    try {
      val (b1, b2) = originals.splitAt(originals.size / 2)
      Seq(b1, b2 :+ copies.head, copies.tail).foreach { b =>
        in.addData(b)
        qSurv.processAllAvailable(); qCand.processAllAvailable()
      }

      val drained = spark.read.parquet(out).select("doc_id", "text")
      val streamedSurvivors = drained.as[(Long, String)].collect().toSet

      // batch reference: gates → min-id exact dedup → redaction
      val full = originals ++ copies
      val fullDf = full.toDF("doc_id", "text")
      val batchExact = Dedup.exactKeepFirst(TrainingDataPipeline.gates(fullDf), "text", "doc_id")
      val batchSurvivors = TextAnalysis.redactPii(batchExact, "doc_id", "text")
        .select(col("doc_id"), col("redacted").as("text"))
        .as[(Long, String)].collect().toSet
      assert(streamedSurvivors == batchSurvivors,
        s"streamed=${streamedSurvivors.size} batch=${batchSurvivors.size}; " +
          s"only-stream=${(streamedSurvivors -- batchSurvivors).map(_._1).take(3)} " +
          s"only-batch=${(batchSurvivors -- streamedSurvivors).map(_._1).take(3)}")
      assert(!streamedSurvivors.exists(_._1 > 100000L), "a planted copy displaced its original")

      // downstream batch resolve over the drained candidate stream must
      // reproduce the batch pipeline's near-dup survivor ids
      val resolved = StreamingCuration.resolveClusters(
        drained, spark.table("scur_cands").select("id_a", "id_b").distinct())
        .select("doc_id").as[Long].collect().toSet
      val batchPairs = Dedup.nearDupPairs(batchExact, "doc_id", "text", numHashes = 64, bands = 16)
      val batchClusters = Dedup.connectedComponents(
        batchExact.select(col("doc_id")), "doc_id", batchPairs, "id_a", "id_b")
      val batchResolved = batchClusters.filter(col("doc_id") === col("cluster_id"))
        .select("doc_id").as[Long].collect().toSet
      assert(resolved == batchResolved,
        s"only-stream=${(resolved -- batchResolved).take(3)} only-batch=${(batchResolved -- resolved).take(3)}")
      assert(resolved.size < streamedSurvivors.size, "corpus has no near-dup clusters — vacuous")

      // full replay: dedup state swallows every text; sink count unchanged
      val before = spark.read.parquet(out).count()
      in.addData(full)
      qSurv.processAllAvailable(); qCand.processAllAvailable()
      assert(spark.read.parquet(out).count() == before, "replay wrote survivors")
    } finally { qSurv.stop(); qCand.stop() }
  }
}
