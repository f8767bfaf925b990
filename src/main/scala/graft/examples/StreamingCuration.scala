package graft.examples

import graft.operators.Dedup
import graft.operators.TextAnalysis
import graft.streaming.{StreamingDedup, StreamingDedupCandidate}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The two live streams a streaming curation run produces: exact-level
  * survivors (gated, exact-deduped, PII-redacted — ready for the
  * exactly-once sink) and the near-duplicate candidate pairs surfacing at
  * ingest (input to the downstream batch [[StreamingCuration.resolveClusters]]
  * step). */
final case class StreamingCurationStreams(
    survivors: DataFrame,
    candidates: Dataset[StreamingDedupCandidate],
    historyMatches: Option[DataFrame] = None)

/** Opt-in BOUNDED-horizon exact dedup for [[StreamingCuration.curate]]:
  * duplicates arriving within `delay` of each other (by the event-time
  * column `tsCol`) are dropped and fingerprint state older than the
  * watermark is PRUNED — for landing-zone deployments where corpus-lifetime
  * state (~32 B/doc; fine at 1B docs but corpus-lifetime by design) is
  * unwanted. The trade is explicit: a duplicate re-arriving after the
  * horizon is re-admitted and must be caught by the downstream batch
  * resolve, exactly like near-dups. */
/** Config for the link-authority curation leg: `scores` is the PERSISTED
  * per-domain frame a batch [[graft.operators.Graph.linkAuthority]] run
  * writes (the historyIndex pattern — a stream-static table re-read per
  * micro-batch, so authority refreshes ride in live with zero stream
  * state), `domainCol` the stream column carrying each document's home
  * domain. Documents whose domain scores below `minScore` drop;
  * `dropUnknown` decides the no-evidence case (domains absent from the
  * score table) — default KEEP, the usual spam-gate posture (punish
  * measured badness, not missing measurements). */
final case class DomainAuthority(scores: DataFrame, domainCol: String,
    minScore: Double, dropUnknown: Boolean = false)

final case class DedupHorizon(tsCol: String, delay: String)

/** Opt-in NEAR-dup memory for [[StreamingCuration.curate]]: the persisted
  * [[Dedup.buildLshIndex]] of all previously curated corpora plus the old
  * documents themselves (consulted only to Jaccard-verify band matches —
  * never for candidate generation). The long-term near-dup sibling of
  * `historyIndex`'s exact-fingerprint memory. `tauNum/tauDen` is the
  * verify threshold — keep it equal to the tau later passed to
  * [[StreamingCuration.resolveClusters]], or the history leg and the
  * in-stream leg silently apply different bars. */
final case class NearDupHistory(index: DataFrame, docs: DataFrame,
    tauNum: Int = 1, tauDen: Int = 2)

/** Opt-in model-based quality gate for [[StreamingCuration.curate]]: a
  * trained hashed-feature linear scorer
  * ([[TextAnalysis.hashedLinearScore]]) applied per row — documents
  * scoring below `minScore` drop at the gate stage, alongside the
  * heuristic metric gates. Pure projection + filter: zero stream state. */
final case class QualityModel(weights: Seq[Double], bias: Double, minScore: Double)

/** Opt-in CONSTANT-MEMORY exact history for [[StreamingCuration.curate]]:
  * a [[graft.operators.Sketches.bloomSketch]] bitmap over all previously
  * curated texts, probed per row ([[graft.operators.Sketches.bloomProbe]] —
  * zero stream state). The trade vs `historyIndex`'s fingerprint anti-join,
  * both ways: the Bloom costs O(mBits) memory TOTAL no matter how large
  * history grows (the anti-join re-reads an O(history) index every
  * micro-batch), but it is one-sided-LOSSY — a false positive drops a
  * genuinely-new document at the (1-e^(-kn/m))^k rate, and the bitmap is
  * fixed at query start (no live generation pickup). No false negatives:
  * every exact re-arrival of history is dropped, guaranteed. */
final case class BloomHistory(sketch: DataFrame, mBits: Int,
    kHashes: Int = 3, salt: String = "bloom")

/** Opt-in SUBSTRING memory for [[StreamingCuration.curate]]: the persisted
  * [[Dedup.buildWindowIndex]] of all previously curated corpora. Arriving
  * documents lose every `w`-token span history already has
  * ([[Dedup.stripKnownWindows]] — an executor-broadcast set probe, zero
  * stream state) BEFORE the quality gates judge what remains — the
  * finest-grained of the three history memories: fingerprints drop exact
  * re-arrivals whole, the LSH index flags near-dup docs, this strips
  * duplicated SPANS out of otherwise-novel documents. */
final case class WindowHistory(index: DataFrame, w: Int = 8)

/** [[TrainingDataPipeline.curate]] AT INGEST TIME — processing documents as
  * they arrive instead of in a nightly batch is the reference's entire
  * identity (its run loop exists to push records the moment an iteration
  * produces them, tamer `core/src/main/scala/tamer/Tamer.scala:150-186`).
  * Composition, all streaming-native:
  *
  *  1. metric gates — [[TrainingDataPipeline.gates]] verbatim: pure per-row
  *     column expressions are the same transform on a readStream frame;
  *  2. exact dedup — `dropDuplicates` on a text fingerprint: first ARRIVAL
  *     wins. (The batch form keeps the min doc_id per text — identical when
  *     arrival order is id order, otherwise a documented representative
  *     difference; the SET of distinct texts is always equal.)
  *  3. PII redaction — per-row, so it rides the stream unchanged;
  *  4. near-dup CANDIDATES at ingest ([[StreamingDedup.nearDupCandidates]]),
  *     emitted as a side stream the moment the second document of a pair
  *     arrives.
  *
  * What is deliberately NOT in the stream: exact-Jaccard verification and
  * connected-components clustering. Verification needs both documents'
  * shingle sets (state would grow corpus-sized) and CC is iterative —
  * both are the downstream batch step [[resolveClusters]], fed by the
  * drained candidate stream. Survivors therefore stream at EXACT-dedup
  * granularity; near-dup losers are removed by the batch resolve, exactly
  * like the batch pipeline's step 4 (diff-tested in
  * `StreamingCurationSpec`).
  *
  * Sink shape: `result.survivors.writeStream.foreachBatch(
  * new ExactlyOnceParquetWriter(out).write _)` — batch-id-idempotent
  * parquet, the engine's parity of the reference's data+state+offset
  * transaction.
  */
object StreamingCuration {

  /** `boilerplateLines` prepends the stream-safe line-strip gate
    * ([[Dedup.stripKnownLines]] — the list is mined by a batch
    * [[Dedup.dedupLines]]/topNgrams pass over an earlier snapshot, the C4
    * order: strip boilerplate BEFORE quality metrics see it). `benchmark`
    * appends the stream-safe decontamination gate
    * ([[TextAnalysis.dropContaminatedStateless]]) — both are pure per-row
    * transforms, so they ride the stream with zero added state.
    * `historyIndex` dedups the stream against ALL previously curated
    * corpora via [[Dedup.dropKnownFingerprints]] — a stream-static anti
    * join, so history costs the stream NO state at all (the static index
    * is re-read per micro-batch, picking up new index generations live);
    * in-stream duplicates are still caught by the stateful stage after
    * it. `dedupHorizon` swaps that stage's corpus-lifetime state for
    * watermark-bounded state (see [[DedupHorizon]] for the trade) — with
    * a `historyIndex` carrying the long-term memory, the bounded horizon
    * is usually the right pairing. `nearDupHistory` adds the NEAR-dup
    * analog of `historyIndex`: a stream-static band join against the
    * persisted LSH index ([[StreamingDedup.nearDupsAgainstIndex]]), also
    * zero stream state, emitting Jaccard-VERIFIED matches against history
    * as a third stream the moment the near-dup arrives. Matched documents
    * are flagged, not dropped in-stream (folding a band-multiplied match
    * row set back to document granularity needs an aggregate, which cannot
    * sit in an append stream) — [[resolveClusters]] removes them, the same
    * division of labor as the in-stream candidates leg. `windowHistory`
    * adds the SUBSTRING-granularity memory (see [[WindowHistory]]):
    * historical spans are stripped out of arriving text before the gates,
    * another pure per-row probe with zero stream state. `qualityModel`
    * appends a trained model gate (see [[QualityModel]]) to the heuristic
    * gates — scored and filtered per row, zero stream state. `bloomHistory`
    * swaps (or backs up) `historyIndex` with a constant-memory Bloom probe
    * of history — per-row, zero stream state, one-sided-lossy (see
    * [[BloomHistory]] for the trade). `canaries` drops any document
    * containing a watchlist string ([[TextAnalysis.findCanaries]]'s
    * exact-substring semantics — the poisoning/secret-leak gate) — a pure
    * per-row literal scan, zero stream state, sitting on the stateless
    * prefix so the candidates branch never sees a poisoned doc either.
    * `domainAuthority` prepends the link-topology spam gate (see
    * [[DomainAuthority]]): a stream-static left join against the
    * persisted per-domain [[graft.operators.Graph.linkAuthority]] score
    * table — the historyIndex discipline applied to graph signals. */
  def curate(
      stream: DataFrame,
      numHashes: Int = 64,
      bands: Int = 16,
      maxBucket: Int = 1024,
      boilerplateLines: Seq[String] = Nil,
      benchmark: Option[DataFrame] = None,
      dedupHorizon: Option[DedupHorizon] = None,
      historyIndex: Option[DataFrame] = None,
      nearDupHistory: Option[NearDupHistory] = None,
      windowHistory: Option[WindowHistory] = None,
      qualityModel: Option[QualityModel] = None,
      bloomHistory: Option[BloomHistory] = None,
      canaries: Seq[String] = Nil,
      domainAuthority: Option[DomainAuthority] = None
  ): StreamingCurationStreams = {
    // withColumn keeps every stream column (e.g. the horizon's event-time
    // column) riding alongside the stripped text
    val stripped =
      if (boilerplateLines.isEmpty) stream
      else stream.withColumn("text",
        Dedup.stripKnownLinesExpr(col("text"), boilerplateLines))
    // substring history strips BEFORE the gates, like the boilerplate leg:
    // the gates must judge the text that will actually be kept (a doc
    // hollowed out by historical spans should fail the token floor here,
    // not pollute the corpus). Pure per-row probe — zero stream state.
    val spanStripped = windowHistory.fold(stripped)(wh =>
      Dedup.stripKnownWindows(stripped, "doc_id", "text", wh.index, wh.w))
    // link-authority gate: a stream-static LEFT join against the persisted
    // per-domain score table (the historyIndex pattern — re-read per
    // micro-batch, zero stream state), filtered before the quality gates
    // so a spam-domain document never reaches them
    val authorityGated = domainAuthority.fold(spanStripped) { da =>
      spanStripped
        .join(da.scores.select(col(da.domainCol),
          col("score").as("__auth_score")), Seq(da.domainCol), "left")
        .filter(
          if (da.dropUnknown) coalesce(col("__auth_score"), lit(Double.NegativeInfinity)) >= da.minScore
          else col("__auth_score").isNull || col("__auth_score") >= da.minScore)
        .drop("__auth_score")
    }
    val heuristicGated = TrainingDataPipeline.gates(
      authorityGated, keep = dedupHorizon.map(_.tsCol).toSeq)
    // model-based quality gate: scored per row, filtered, score dropped —
    // another pure projection riding the stream with zero state
    val gated = qualityModel.fold(heuristicGated)(m =>
      TextAnalysis.hashedLinearScore(heuristicGated, "doc_id", "text", m.weights, m.bias)
        .filter(col("quality_score") >= m.minScore)
        .drop("quality_score"))
    // decontamination is a pure per-row probe (stateless), so it sits
    // before the stateful dedup and the candidates branch sees it too
    val deconOnly = benchmark.fold(gated)(b =>
      TextAnalysis.dropContaminatedStateless(gated, "doc_id", "text", b, "text"))
    // canary gate: exact-substring watchlist, per-row, zero state — a
    // poisoned document must never reach the corpus OR the candidate state
    val canaryClean =
      if (canaries.isEmpty) deconOnly
      else deconOnly.filter(!canaries.map(c => col("text").contains(c)).reduce(_ || _))
    // history dedup is a stream-static anti join — also stateless on the
    // stream side, so candidates branch after it as well
    val indexDeduped = historyIndex.fold(canaryClean)(idx =>
      Dedup.dropKnownFingerprints(canaryClean, "text", idx))
    // constant-memory exact history: a per-row bitmap probe (see
    // [[BloomHistory]] for the trade vs the index anti-join) — the collect
    // is small-by-contract (the bitmap IS the memory budget, guarded in
    // collectBloom), done once at query build
    val decon = bloomHistory.fold(indexDeduped) { bh =>
      val bitmap = graft.operators.Sketches.collectBloom(bh.sketch, bh.mBits)
      indexDeduped.filter(
        !graft.operators.Sketches.bloomProbe(col("text"), bitmap, bh.mBits, bh.kHashes, bh.salt))
    }
    // keyed on the md5 fingerprint, not the text itself: dedup state holds
    // 32 hex chars per distinct document instead of the document
    val fp = decon.withColumn("__fp", md5(col("text")))
    val deduped = (dedupHorizon match {
      case None => fp.dropDuplicates("__fp")
      case Some(h) =>
        fp.withWatermark(h.tsCol, h.delay).dropDuplicatesWithinWatermark("__fp")
    }).drop("__fp")
    val survivors = TextAnalysis.redactPii(deduped, "doc_id", "text")
      .select(col("doc_id"), col("redacted").as("text"))
    // candidates branch off the stateless prefix, not the deduped stream:
    // Spark restricts flatMapGroupsWithState downstream of another stateful
    // operator, and candidate emission must not depend on dedup state
    // anyway — pairs involving exact-dup losers are dropped downstream by
    // [[resolveClusters]]'s verify join against the survivor set
    val candidates = StreamingDedup.nearDupCandidates(
      decon, "doc_id", "text", shingleN = 3, numHashes, bands, maxBucket)
    // the history near-dup leg also branches off the stateless prefix: its
    // stream-static joins are per-row, and an exact-dup loser's history
    // match is harmless (resolveClusters drops by id against survivors)
    val historyMatches = nearDupHistory.map(h =>
      StreamingDedup.nearDupsAgainstIndex(
        decon, "doc_id", "text", h.index, h.docs,
        shingleN = 3, numHashes, bands, tauNum = h.tauNum, tauDen = h.tauDen))
    StreamingCurationStreams(survivors, candidates, historyMatches)
  }

  /** Runnable form, mirroring [[TrainingDataPipeline.main]]: stream the
    * corpus parquet file-by-file through [[curate]] into an exactly-once
    * parquet sink (survivors) and an append parquet sink (candidates), then
    * run the downstream batch [[resolveClusters]] and report counts.
    *
    * {{{
    * sbt "runMain graft.examples.StreamingCuration /root/testdata/sf0.001 /tmp/scurated"
    * }}}
    */
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = graft.GraftSession.local("graft-streaming-curation")
    try {
      // the file stream source consumes a DIRECTORY; stage the corpus as
      // several files so the run is genuinely multi-batch (one file per
      // trigger), like a landing zone being filled by an upstream ingest
      val staging = s"$outDir/input"
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .repartition(4).write.mode("overwrite").parquet(staging)
      val schema = spark.read.parquet(staging).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(staging)
      val streams = curate(stream)
      val writer = new graft.sinks.ExactlyOnceParquetWriter(s"$outDir/survivors")
      val qSurv = streams.survivors.writeStream
        .foreachBatch(writer.write _)
        .option("checkpointLocation", s"$outDir/ckpt-survivors")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      val qCand = streams.candidates.writeStream
        .format("parquet").option("path", s"$outDir/candidates")
        .option("checkpointLocation", s"$outDir/ckpt-candidates")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      qSurv.awaitTermination(); qCand.awaitTermination()
      // the maintenance pass every streaming sink needs: the per-trigger
      // files the run just wrote get compacted (writers are quiesced — the
      // queries above terminated — which is exactly the swap-window fence)
      val report = graft.sinks.Compaction.compactParquet(spark, s"$outDir/survivors")
      val survivors = spark.read.parquet(s"$outDir/survivors").select("doc_id", "text")
      val cands = spark.read.parquet(s"$outDir/candidates").select("id_a", "id_b").distinct()
      val resolved = resolveClusters(survivors, cands)
      println(s"[streaming-curation] survivors=${survivors.count()} " +
        s"candidates=${cands.count()} after-resolve=${resolved.count()} " +
        s"compacted=${report.filesBefore}->${report.filesAfter} files -> $outDir")
    } finally spark.stop()
  }

  /** The batch step downstream of a streaming run: exact-Jaccard-verify the
    * drained candidate pairs against the survivor texts, cluster with
    * connected components, keep each cluster's minimum id — the same
    * verify → CC → keep-min tail as [[TrainingDataPipeline.curate]] step 4.
    * `survivors`/`candidates` are the DRAINED (batch-read) outputs of
    * [[curate]], so verification shingles the REDACTED text while the batch
    * pipeline shingles raw text — a documented approximation: exact-equal
    * raw texts redact identically (J stays 1), so true duplicate clusters
    * are unaffected; only a pair already sitting ON the tau boundary whose
    * PII spans differ could flip. Callers with the raw corpus at hand can
    * pass it instead for bit-parity with the batch pipeline.
    *
    * `historyMatches` is the drained third stream of a `nearDupHistory`
    * run: already-VERIFIED matches against previously curated history, so
    * no re-verification here — the matched stream documents (`id_a`) are
    * simply dropped, history always wins (its documents shipped long ago).
    */
  def resolveClusters(
      survivors: DataFrame,
      candidates: DataFrame,
      tauNum: Int = 1,
      tauDen: Int = 2,
      historyMatches: Option[DataFrame] = None
  ): DataFrame = {
    val fresh = historyMatches.fold(survivors)(m =>
      survivors.join(m.select(col("id_a").as("doc_id")).distinct().hint("shuffle_merge"),
        Seq("doc_id"), "left_anti"))
    val verified = Dedup.verifyCandidatePairs(
      fresh, "doc_id", "text", candidates, shingleN = 3, tauNum = tauNum, tauDen = tauDen)
    val clusters = Dedup.connectedComponents(
      fresh.select(col("doc_id")), "doc_id", verified, "id_a", "id_b")
    val keepers = clusters.filter(col("doc_id") === col("cluster_id")).select("doc_id")
    fresh.join(keepers, Seq("doc_id"), "left_semi")
  }
}
