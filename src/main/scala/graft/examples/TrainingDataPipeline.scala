package graft.examples

import graft.GraftSession
import graft.operators.{Chunking, Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation over a raw document corpus — the whole
  * library composed the way a real 100 TB pipeline would chain it:
  *
  *  1. quality gate   — cheap codegen'd per-row metrics, pushdown-friendly;
  *  2. language gate  — stopword-profile argmax, keep English;
  *  2b. repetition gate — drop boilerplate/template pages by repeated-
  *                      n-gram fraction (pure per-row expressions, fuses
  *                      into the same scan as 1-2);
  *  3. exact dedup    — one hash shuffle on content;
  *  4. near-dup dedup — MinHash-LSH candidates → exact-Jaccard verify →
  *                      connected components → keep each cluster's min id;
  *  4b. decontamination — optional: drop documents sharing n-grams with a
  *                      supplied benchmark/eval corpus (leakage gate);
  *  5. PII redaction  — engine-portable regex scrub before anything
  *                      tokenizes the text;
  *  6. chunk + split  — overlapping token windows, then a deterministic
  *                      95/5 train/val assignment (keyed by DOCUMENT so
  *                      chunks of one document never straddle the split),
  *                      partitioned parquet output;
  *  7. sequence packing — each split's chunks binned into fixed-token
  *                      packs (distributed prefix sum; packed separately
  *                      per split so no pack straddles train/val).
  *
  * Every stage is a lazy DataFrame transform; nothing but the final write
  * and the dedup-cluster loop triggers a job. Run locally:
  *
  * {{{
  * sbt "runMain graft.examples.TrainingDataPipeline /root/testdata/sf0.001 /tmp/curated"
  * }}}
  */
object TrainingDataPipeline {

  /** The curation chain as a reusable transform: documents(doc_id, text) in,
    * labeled survivors out. Pass `benchmark` (any frame with a `text`
    * column) to also drop documents overlapping it — the pre-training
    * leakage gate. */
  def curate(docs: DataFrame, benchmark: Option[DataFrame] = None): DataFrame = {
    // 1-2b: metric gates — all pure expressions, they fuse into the scan
    val quality = TextAnalysis.qualityMetrics(docs, "doc_id", "text")
      .filter(col("token_cnt") >= 5 && col("distinct_ratio") > 0.2)
      .select("doc_id")
    val english = TextAnalysis.languageScores(docs, "doc_id", "text")
      .filter(col("detected") === "en")
      .select("doc_id")
    val lowRepetition = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
      .filter(col("dup_ngram_frac") < 0.3)
      .select("doc_id")
    val gated = docs
      .join(quality, Seq("doc_id"), "left_semi")
      .join(english, Seq("doc_id"), "left_semi")
      .join(lowRepetition, Seq("doc_id"), "left_semi")

    // 3: exact dedup — keep the lowest id per identical text
    val exact = Dedup.exactKeepFirst(gated, "text", "doc_id")

    // 4: near-dup clusters at Jaccard >= 0.5; survivors = cluster minima
    val pairs = Dedup.nearDupPairs(exact, "doc_id", "text", numHashes = 64, bands = 16)
    val clusters = Dedup.connectedComponents(
      exact.select(col("doc_id")), "doc_id", pairs, "id_a", "id_b")
    val keepers = clusters.filter(col("doc_id") === col("cluster_id")).select("doc_id")
    val afterDedup = exact.join(keepers, Seq("doc_id"), "left_semi")

    // 4b: leakage gate — runs AFTER dedup so the n-gram probe scans each
    // surviving text once, not once per duplicate copy
    val deduped = benchmark.fold(afterDedup) { bench =>
      val clean = TextAnalysis.flagContaminated(
        afterDedup, "doc_id", "text", bench, "text")
        .filter(!col("contaminated"))
        .select("doc_id")
      afterDedup.join(clean, Seq("doc_id"), "left_semi")
    }

    // 5: scrub before tokenization (redactPii carries doc_id through — no
    // join back to the expensive dedup subtree needed)
    val clean = TextAnalysis.redactPii(deduped, "doc_id", "text")
      .select(col("doc_id"), col("redacted").as("text"))

    // 6: window into training sequences, split by DOCUMENT (the split is
    // decided on doc_id, so every chunk of a document lands together —
    // chunk-level splitting would leak near-identical overlapping windows
    // across the train/val boundary)
    val chunked = Chunking.chunkByTokens(clean, "doc_id", "text", chunkTokens = 64, overlap = 8)
    val split = Sampling.hashSplit(chunked, "doc_id", Seq("train" -> 0.95, "val" -> 0.05), "curate-v1")

    // 7: bin each split's chunks into 512-token training packs — per split,
    // so a pack can never mix train and val tokens
    Seq("train", "val")
      .map(s => Chunking.packSequences(
        split.filter(col("split") === s),
        "doc_id", "chunk_idx", "chunk_tokens", capacity = 512))
      .reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = GraftSession.local("graft-training-pipeline")
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").cast("long"), col("text"))
      val curated = curate(docs)
      curated.write.mode("overwrite").partitionBy("split").parquet(outDir)
      val counts = spark.read.parquet(outDir)
        .groupBy("split").count().collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(", ")
      println(s"[pipeline] in=${docs.count()} out: $counts -> $outDir")
    } finally spark.stop()
  }
}
