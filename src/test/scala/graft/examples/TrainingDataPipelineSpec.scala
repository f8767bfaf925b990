package graft.examples

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed curation pipeline holds its invariants on a real corpus. */
class TrainingDataPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("curate: no exact dups survive, every row is labeled, result is deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
    val out = TrainingDataPipeline.curate(docs).cache()
    try {
      val n = out.count()
      assert(n > 0 && n < 500, s"gates must drop something and keep something, n=$n")
      // exact dedup held
      assert(out.groupBy("text").count().filter(col("count") > 1).isEmpty)
      // split exhaustive over survivors
      assert(out.filter(!col("split").isin("train", "val")).isEmpty)
      // determinism: a second run selects the identical set
      val again = TrainingDataPipeline.curate(docs)
        .select("doc_id", "split").as[(Long, String)].collect().toSet
      assert(again == out.select("doc_id", "split").as[(Long, String)].collect().toSet)
    } finally out.unpersist()
  }
}
