package graft.examples

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed curation pipeline holds its invariants on a real corpus. */
class TrainingDataPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("curate lineDedupFirst: degenerates to exact dedup on a single-line corpus; strips boilerplate lines on a multi-line one") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
    // single-line corpus: line dedup before the gates IS exact keep-first
    // dedup, which the chain performs anyway — identical output
    val base = TrainingDataPipeline.curate(docs)
      .select("doc_id", "chunk_idx", "split").as[(Long, Int, String)].collect().toSet
    val withLd = TrainingDataPipeline.curate(docs, lineDedupFirst = true)
      .select("doc_id", "chunk_idx", "split").as[(Long, Int, String)].collect().toSet
    assert(withLd == base)

    // multi-line: a boilerplate line appended to EVERY doc must reach the
    // gate stage at most once corpus-wide when the pre-stage is on
    val boiler = "subscribe to this very fine newsletter today"
    val multi = docs.select(col("doc_id"),
      concat(col("text"), lit("\n" + boiler)).as("text"))
    val gateInput = graft.operators.Dedup.dedupLines(multi, "doc_id", "text")
    val carriers = gateInput.filter(col("text").contains(boiler)).count()
    assert(carriers == 1L, s"boilerplate line survived in $carriers docs")
  }

  test("curate: chunks are unique, split is per-document, result is deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
    val out = TrainingDataPipeline.curate(docs).cache()
    try {
      val survivors = out.select("doc_id").distinct()
      val nSurvivors = survivors.count()
      assert(nSurvivors > 0 && nSurvivors < 500,
        s"gates must drop something and keep something, docs=$nSurvivors")
      // dedup held end to end: no two surviving documents share a text
      assert(docs.join(survivors, Seq("doc_id"), "left_semi")
        .groupBy("text").count().filter(col("count") > 1).isEmpty)
      // exactly one row per (doc, window)
      assert(out.groupBy("doc_id", "chunk_idx").count().filter(col("count") > 1).isEmpty)
      // split decided per DOCUMENT: chunks of one doc never straddle it
      assert(out.groupBy("doc_id").agg(countDistinct("split").as("s"))
        .filter(col("s") > 1).isEmpty)
      assert(out.filter(!col("split").isin("train", "val")).isEmpty)
      // packing runs per split (pack identity = (split, pack_id)): each
      // split's ids start at 0 and are gapless, so no pack mixes splits
      out.select("split", "pack_id").distinct().as[(String, Long)].collect()
        .groupBy(_._1).foreach { case (s, ids) =>
          val sorted = ids.map(_._2).sorted
          assert(sorted.head == 0L && sorted.last == sorted.length - 1,
            s"split $s pack ids not dense: ${sorted.take(5).mkString(",")}...")
        }
      // determinism: a second run produces the identical chunk set
      val again = TrainingDataPipeline.curate(docs)
        .select("doc_id", "chunk_idx", "split").as[(Long, Int, String)].collect().toSet
      assert(again == out.select("doc_id", "chunk_idx", "split")
        .as[(Long, Int, String)].collect().toSet)
    } finally out.unpersist()
  }

  test("curate stripSubstrings: a tail shared across every doc vanishes from the chunks; off, it rides through") {
    val marker = "sharedmarkertoken"
    val tail = s" begin $marker common phrase spanning enough tokens here end"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), concat(col("text"), lit(tail)).as("text"))
    val off = TrainingDataPipeline.curate(docs)
    assert(off.filter(col("chunk").contains(marker)).count() > 0,
      "without the strip leg the shared tail must reach the chunks")
    val on = TrainingDataPipeline.curate(docs, stripSubstrings = true).cache()
    try {
      assert(on.select("doc_id").distinct().count() > 0)
      // every 8-token window inside the tail occurs in EVERY doc, so the
      // strip leg must remove the whole tail from every survivor
      assert(on.filter(col("chunk").contains(marker)).isEmpty,
        "cross-doc duplicated tail survived the strip leg")
    } finally on.unpersist()
  }

  test("gates: one scan, zero exchanges, survivors equal the semi-join formulation") {
    import graft.operators.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
    val gated = TrainingDataPipeline.gates(docs)

    // the whole gate stage is per-row: no exchange of any kind may appear
    // in its physical plan (a join or aggregation would plan one)
    val plan = gated.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gate stage must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"gate stage must not join:\n$plan")

    // value parity with the pre-round-5 composition: each metric frame
    // filtered on the same threshold, semi-joined back
    val quality = TextAnalysis.qualityMetrics(docs, "doc_id", "text")
      .filter(col("token_cnt") >= 5 && col("distinct_ratio") > 0.2).select("doc_id")
    val english = TextAnalysis.languageScores(docs, "doc_id", "text")
      .filter(col("detected") === "en").select("doc_id")
    val lowRep = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
      .filter(col("dup_ngram_frac") < 0.3).select("doc_id")
    val viaJoins = docs
      .join(quality, Seq("doc_id"), "left_semi")
      .join(english, Seq("doc_id"), "left_semi")
      .join(lowRep, Seq("doc_id"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    val viaScan = gated.select("doc_id").as[Long].collect().toSet
    assert(viaScan == viaJoins,
      s"single-scan gates diverge from semi-join gates: " +
        s"only-scan=${(viaScan -- viaJoins).take(5)} only-join=${(viaJoins -- viaScan).take(5)}")
    assert(viaScan.nonEmpty && viaScan.size < docs.count())
  }

  test("curate with a benchmark drops overlapping documents and nothing else") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
    val base = TrainingDataPipeline.curate(docs)
      .select("doc_id").distinct().as[Long].collect().toSet
    // benchmark = the texts of a few surviving documents -> exactly those
    // docs (and any doc sharing a 3-gram with them) must disappear
    val benchIds = base.toSeq.sorted.take(3)
    val bench = docs.filter(col("doc_id").isin(benchIds: _*)).select("text")
    val decon = TrainingDataPipeline.curate(docs, Some(bench))
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(benchIds.forall(id => !decon.contains(id)),
      "documents whose full text is in the benchmark must be dropped")
    assert(decon.subsetOf(base), "decontamination must only remove documents")
  }
}
