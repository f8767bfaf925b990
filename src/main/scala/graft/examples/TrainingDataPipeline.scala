package graft.examples

import graft.GraftSession
import graft.operators.{Chunking, Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation over a raw document corpus — the whole
  * library composed the way a real 100 TB pipeline would chain it:
  *
  *  1-2b. metric gates — quality (token count / distinct ratio), language
  *                      (stopword-profile argmax, keep English) and
  *                      repetition (repeated-n-gram fraction): all pure
  *                      codegen'd per-row expressions composed from ONE
  *                      tokenization as one `select` + one `filter` —
  *                      a single scan of the corpus, zero joins, zero
  *                      exchanges (see [[gates]]);
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

  /** Stages 1-2b as ONE stateless pass: every metric gate — quality,
    * language, repetition — is computed from a single tokenization inside a
    * single `select` + `filter`, so the whole gate stage is one scan of the
    * corpus with zero joins and zero exchanges (plan-asserted in
    * `TrainingDataPipelineSpec`). The thresholds are the same expressions
    * the DataFrame metric forms emit, so survivors are identical to
    * semi-joining the three metric frames — just without re-reading a
    * 100 TB corpus three extra times.
    *
    * Pure per-row expressions also make this the streaming gate: the same
    * transform applies unchanged to a readStream frame (no aggregation, no
    * state), exactly like the reference's pure per-page `filterPage`
    * (reference: rest/src/main/scala/tamer/rest/RESTSetup.scala:181-184).
    */
  def gates(docs: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    // bind tokens, then n-grams, to projected columns before the metric
    // lambdas — the once-per-row discipline used across the dedup family
    val toks = col("__toks")
    val kept = keep.map(col)
    docs
      .select(Seq(col("doc_id"), col("text")) ++ kept :+
        TextAnalysis.tokens(col("text")).as("__toks"): _*)
      .select(Seq(col("doc_id"), col("text")) ++ kept :+ toks :+
        TextAnalysis.wordNgrams(toks, 3).as("__grams"): _*)
      .filter(
        TextAnalysis.tokenCount(toks) >= 5 &&
          TextAnalysis.distinctRatio(toks) > 0.2 &&
          TextAnalysis.detectedLanguage(toks) === "en" &&
          TextAnalysis.dupNgramFrac(col("__grams")) < 0.3)
      .select(Seq(col("doc_id"), col("text")) ++ kept: _*)
  }

  /** The curation chain as a reusable transform: documents(doc_id, text) in,
    * labeled survivors out. Pass `benchmark` (any frame with a `text`
    * column) to also drop documents overlapping it — the pre-training
    * leakage gate. `lineDedupFirst` prepends corpus-wide line-level dedup
    * (the C4 order: strip shared boilerplate BEFORE quality metrics see
    * it); on a single-line corpus this degenerates to exact keep-first
    * dedup, so the default pipeline's result is unchanged (spec-pinned).
    * `stripSubstrings` inserts cross-doc repeated-substring removal AFTER
    * doc-level dedup (whole-dup docs are already gone, so the window table
    * is survivor-sized) and BEFORE decontamination/redaction (which must
    * see the final text); docs stripped below the 5-token quality floor
    * are dropped, the same threshold the gates applied. */
  def curate(
      docs: DataFrame,
      benchmark: Option[DataFrame] = None,
      lineDedupFirst: Boolean = false,
      stripSubstrings: Boolean = false): DataFrame = {
    val pre = if (lineDedupFirst) Dedup.dedupLines(docs, "doc_id", "text") else docs
    // 1-2b: metric gates — one scan, one filter, no joins
    val gated = gates(pre)

    // 3: exact dedup — keep the lowest id per identical text
    val exact = Dedup.exactKeepFirst(gated, "text", "doc_id")

    // 4: near-dup clusters at Jaccard >= 0.5; survivors = cluster minima
    val pairs = Dedup.nearDupPairs(exact, "doc_id", "text", numHashes = 64, bands = 16)
    val clusters = Dedup.connectedComponents(
      exact.select(col("doc_id")), "doc_id", pairs, "id_a", "id_b")
    val keepers = clusters.filter(col("doc_id") === col("cluster_id")).select("doc_id")
    val afterDedup = exact.join(keepers, Seq("doc_id"), "left_semi")

    // 4b (opt-in): strip cross-doc repeated substrings the doc-level dedup
    // could not remove (partial overlaps below the near-dup threshold);
    // re-apply the 5-token floor since stripping can hollow a doc out
    val afterStrip =
      if (!stripSubstrings) afterDedup
      else Dedup.stripDuplicatedWindows(afterDedup, "doc_id", "text", w = 8)
        .filter(size(TextAnalysis.tokens(col("text"))) >= 5)

    // 4c: leakage gate — runs AFTER dedup so the n-gram probe scans each
    // surviving text once, not once per duplicate copy
    val deduped = benchmark.fold(afterStrip) { bench =>
      val clean = TextAnalysis.flagContaminated(
        afterStrip, "doc_id", "text", bench, "text")
        .filter(!col("contaminated"))
        .select("doc_id")
      afterStrip.join(clean, Seq("doc_id"), "left_semi")
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
