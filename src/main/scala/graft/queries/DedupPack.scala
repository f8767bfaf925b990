package graft.queries
import graft.Tables
import graft.operators.{AsofJoin, Chunking, Dedup, Multimodal, Profiler, RangeJoin, Rollup, Sampling, Similarity, Sketches, Skew, TextAnalysis, TimeSeries, Tokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import PackShared._

/** Deduplication & contamination: exact/near/line/SimHash/Jaccard/containment/winnowing dedup, connected components, ER, ppjoin, persisted dup-window indexes, decontamination and canary audits.
  *
  * Conventions: every computed column aliased identically on both
  * engines, deterministic ORDER BY, exact-decimal float sums — see
  * [[QueryPack]]. */
object DedupPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup via ONE hash shuffle (groupBy key, min/count partial aggs).
    "q24_dedup_exact" -> ((s, d) => {
      Dedup.exactGroups(Tables.documents(s, d), "text", "doc_id")
        .select(col("keep_id"), col("copies"))
        .orderBy(col("keep_id"))
    }),

    // MinHash -> LSH band bucketing -> exact-Jaccard verify; integer counts
    // out. 64 hashes as 16 bands x 4 rows: for true pairs (J >= 0.9 in this
    // corpus; nothing sits near the tau=0.5 boundary) the miss probability
    // is (1 - 0.9^4)^16 ~ 4e-8, so the LSH output still equals the exact
    // all-pairs oracle while halving the signature cost vs the 128-hash
    // default.
    "q25_dedup_near" -> ((s, d) => {
      Dedup.nearDupPairs(Tables.documents(s, d), "doc_id", "text", numHashes = 64, bands = 16)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Order-sensitive rolling-hash + md5 content fingerprints.
    "q30_fingerprint" -> ((s, d) => {
      TextAnalysis.fingerprints(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Corpus-wide LINE-LEVEL dedup (C4/CCNet boilerplate removal): repeated
    // lines >= 3 tokens survive only at their first (doc_id, pos)
    // occurrence; short lines are exempt. The corpus is single-line, so
    // both engines PLANT identical line structure (a per-mod-7 shared
    // header, the unique body, a global boilerplate line, a 2-token footer
    // that must survive everywhere), then dedup: the oracle re-derives
    // keep-first with a window over the same construction.
    "q62_line_dedup" -> ((s, d) => {
      val lined = Tables.documents(s, d).select(col("doc_id"),
        concat_ws("\n",
          concat(lit("promo "), (col("doc_id") % 7).cast("string"), lit(" header")),
          col("text"),
          lit("subscribe to our newsletter today"),
          lit("-- footer")).as("text"))
      Dedup.dedupLines(lined, "doc_id", "text", "\n", minTokens = 3)
        .orderBy(col("doc_id"))
    }),

    // Incremental near-dup against a persisted LSH band index (the
    // nightly-ingest shape: yesterday's corpus is never re-signatured).
    // Newcomers are planted twins of every 20th document; the old corpus
    // is consulted only to verify index-matched ids. At 128 hashes /
    // 32 bands the candidate recall at J >= 0.5 equals the exact
    // new-x-old answer on this corpus (q25's argument), so the oracle is
    // exact pairwise Jaccard restricted to new-x-old.
    "q74_index_neardup" -> ((s, d) => {
      val old = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val newcomers = old.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      val index = Dedup.buildLshIndex(old, "doc_id", "text")
      Dedup.nearDupAgainstIndex(newcomers, "doc_id", "text", index, old)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Incremental EXACT dedup against a fingerprint index (the corpus has
    // no natural exact duplicates — q24 finds 1 copy per text — so the
    // newcomer batch is constructed: every 4th document re-arrives
    // verbatim (must drop) and every 4th+1 arrives with a suffix edit
    // (must survive — exact dedup is not fuzzy). Anti-join on md5,
    // SMJ-pinned against the corpus-sized index.
    "q75_index_exact_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val index = Dedup.buildFingerprintIndex(docs, "text")
      val newcomers = docs.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 4 === 1)
          .select((col("doc_id") + 200000L).as("doc_id"),
            concat(col("text"), lit(" revised edition")).as("text")))
      Dedup.dropKnownFingerprints(newcomers, "text", index)
        .orderBy(col("doc_id"))
    }),

    // Index LIFECYCLE end-to-end: three nightly runs, each dedping its
    // day against the generations on disk and appending its admissions as
    // the next generation (re-arrival unions exercise the drop path), then
    // a consolidation collapses the generations. Oracle: the from-scratch
    // index — distinct fingerprints over the whole corpus — plus
    // over_admitted = pre-consolidation rows minus distinct rows, which is
    // 0 only if no run re-admitted (or double-appended) a known text.
    "q83_index_lifecycle" -> ((s, d) => {
      import graft.sinks.IndexStore
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      // per-run unique dir: a fixed shared path would let two concurrent
      // harness processes delete each other's generations mid-append
      val tmp = java.nio.file.Files.createTempDirectory("graft-q83-index")
      val dir = tmp.resolve("store").toString
      try {
        val day0 = docs.filter(col("doc_id") % 3 === 0)
        val day1 = docs.filter(col("doc_id") % 3 === 1)
          .unionByName(day0.filter(col("doc_id") % 2 === 0)) // run-0 re-arrivals
        val day2 = docs.filter(col("doc_id") % 3 === 2)
          .unionByName(day1.filter(col("doc_id") % 5 === 1)) // run-0/1 re-arrivals
        IndexStore.append(Dedup.buildFingerprintIndex(day0, "text"), dir)
        Seq(day1, day2).foreach { day =>
          val admitted = Dedup.dropKnownFingerprints(day, "text", IndexStore.read(s, dir))
          IndexStore.append(Dedup.buildFingerprintIndex(admitted, "text"), dir)
        }
        val preRows = IndexStore.read(s, dir).count()
        val (_, rowsAfter) = IndexStore.consolidate(s, dir)
        // localCheckpoint materializes the consolidated index (fp hashes,
        // tiny) so the store dir can be deleted before return (min-of-N
        // bench re-runs would otherwise accrete one store per run in /tmp)
        IndexStore.read(s, dir).localCheckpoint(true)
          .withColumn("over_admitted", lit(preRows - rowsAfter).cast("long"))
          .orderBy(col("fp"))
      } finally PackShared.deleteRecursively(tmp.toString)
    }),

    // Known-boilerplate line strip (the stream-safe dedupLines sibling):
    // lines planted deterministically, stripped as a pure per-row
    // expression; the oracle replays the plant + strip in list functions.
    "q72_strip_lines" -> ((s, d) => {
      val planted = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .withColumn("text",
          when(col("doc_id") % 3 === 0,
            concat(lit("all rights reserved\n"), col("text"),
              lit("\nsubscribe to our newsletter today")))
            .when(col("doc_id") % 5 === 0, concat(col("text"), lit("\nall rights reserved")))
            .otherwise(col("text")))
      Dedup.stripKnownLines(planted, "doc_id", "text",
        Seq("subscribe to our newsletter today", "all rights reserved"))
        .orderBy(col("doc_id"))
    }),

    // SimHash near-dup. The token hash is an md5 prefix, so even this
    // signature scheme is oracle-checked: the oracle SQL rebuilds the
    // majority-vote signature per document from the same hash.
    "q32_dedup_simhash" -> ((s, d) => {
      Dedup.simHashNearDupPairs(Tables.documents(s, d), "doc_id", "text", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Exact n-gram Jaccard pairs via the inverted shingle index (the direct,
    // non-LSH dedup family member) — must equal q25's LSH+verify output AND
    // the same all-pairs oracle.
    "q39_ngram_jaccard" -> ((s, d) => {
      Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Image-corpus near-dup END TO END — the VLM-training dedup story:
    // deterministic synthetic PNGs (REAL ImageIO encode), decoded back
    // through the REAL ImageIO path into 8x8 luminance-grid features, then
    // banded sign-LSH cosine pairs with exact verification. Every doc_id %
    // 20 == 0 image gets a planted near-dup twin (one pixel shifted +8,
    // cosine ~ 0.9999). The oracle rebuilds the decoded features
    // closed-form — same double-arithmetic tree as the luminance kernel,
    // CAST AS REAL mirroring the Float cast — and runs all-pairs cosine,
    // so the gate is equality with the exact answer through a real
    // encode -> decode -> feature -> LSH -> verify pipeline.
    "q84_image_neardup" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") % 10 === 0)
      val ids = base.select(col("doc_id").as("media_id"),
          col("doc_id").as("seed"), lit(false).as("perturb"))
        .unionByName(base.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 1000000L).as("media_id"),
            col("doc_id").as("seed"), lit(true).as("perturb")))
      val media = Multimodal.syntheticGrayPngs(ids)
      val feats = Multimodal.extractImageFeatures(media, gridW = 8, gridH = 8)
        .select(col("media_id").as("vec_id"), col("features").as("embedding"))
      // Band width from the measured §8.5 occupancy law, like every other
      // LSH gate (r17): the vector count equals the ids count, so sizing
      // costs one doc_id-column scan — the ImageIO decode chain never runs
      // twice. At the gate corpora this resolves to the same 3 bits the
      // all-pairs oracle calibration pinned (recall 1 there), so the gate
      // output is unchanged while a 100x corpus gets the stepped width.
      val sizedBits = Similarity.sizedBandBits(ids.count(), dim = 64)
      // centerForBuckets: luminance features are single-orthant, the case
      // where raw sign-LSH buckets collapse; verification is unchanged so
      // the all-pairs oracle still holds row for row
      Similarity.cosineNearDupPairsLsh(feats, "vec_id", "embedding",
        threshold = 0.99, dim = 64, bandBits = sizedBits, bands = 32,
        centerForBuckets = true)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Cross-document repeated-substring profile at 5-token granularity
    // (Lee et al. substring dedup, the detection half): how many of each
    // doc's windows also appear verbatim in some OTHER doc.
    "q85_dup_window_stats" -> ((s, d) => {
      Dedup.duplicatedWindowStats(Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", w = 5)
        .orderBy(col("doc_id"))
    }),

    // The removal half: every token covered by a cross-doc-duplicated
    // 5-token window is stripped (overlaps merge), untouched docs pass
    // through byte-identical.
    "q86_strip_dup_windows" -> ((s, d) => {
      Dedup.stripDuplicatedWindows(Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", w = 5)
        .orderBy(col("doc_id"))
    }),

    // URL canonicalization + canonical-URL dedup (the crawl-dedup key
    // normalizer): four planted variants per URL group — scheme/case noise,
    // www prefix, default port, trailing slash, unsorted + utm_ params,
    // fragments — collapse to two canonical forms per group (with-query and
    // without); exactKeepFirst keeps the lowest doc_id per canonical. The
    // oracle applies the SAME regexp/list chain.
    "q118_url_dedup" -> ((s, d) => {
      val g = col("doc_id") % 50
      val url = when(col("doc_id") % 4 === 0,
          concat(lit("HTTP://WWW.example"), g, lit(".com/Path/A/?b=2&a=1&utm_source=x#frag")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("https://example"), g, lit(".com/Path/A?a=1&b=2")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("http://Example"), g, lit(".com:80/Path/A/")))
        .otherwise(
          concat(lit("https://www.example"), g, lit(".com/Path/A#top")))
      val withCanon = Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.canonicalizeUrl(url).as("canonical"))
      Dedup.exactKeepFirst(withCanon, "canonical", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Semantic decontamination: the embedding-level benchmark gate — drop
    // every corpus vector within cosine 0.3 of the 10-vector "eval set"
    // (vec_id < 10, which also removes the eval members themselves at
    // cosine 1). Eval side broadcast by contract; anti-join SMJ-pinned.
    "q122_semantic_decon" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.semanticDecontaminate(e, "vec_id", "embedding",
        e.filter(col("vec_id") < 10), "vec_id", "embedding", threshold = 0.3)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))
    }),

    // Containment pairs (Broder's directional coefficient): every 10th doc
    // gets a planted 12-token snippet twin — near-zero Jaccard, containment
    // 1.0 — and the inverted-index gate surfaces exactly the pairs where
    // either direction clears 9/10. Integer-exact counts + ratios out.
    "q124_containment" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val snippets = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 12)).as("text"))
      Dedup.containmentPairs(docs.unionByName(snippets), "doc_id", "text",
        shingleN = 3, tauNum = 9, tauDen = 10)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // IDF-weighted SimHash signatures (the Charikar/Manku production form):
    // integer-quantized idf weights from an in-plan df aggregation, so the
    // per-bit vote sums stay integer-exact and the generated oracle
    // reproduces every signature bit for bit.
    "q119_simhash_idf" -> ((s, d) => {
      Dedup.simHashWeighted(Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // WITHIN-doc line dedup (C4's intra-document step): both engines plant
    // the same repeated header and a repeated body copy inside every doc;
    // the repeats vanish, the short "--" separator repeats survive, and
    // cross-doc repetition (the same header text in other docs) is
    // untouched — that distinction is exactly the operator's contract.
    "q94_line_dedup_within" -> ((s, d) => {
      val lined = Tables.documents(s, d).select(col("doc_id"),
        concat_ws("\n",
          lit("repeated header line x"),
          col("text"),
          lit("--"),
          lit("repeated header line x"),
          col("text"),
          lit("--")).as("text"))
      Dedup.dedupLinesWithinDoc(lined, "doc_id", "text", "\n", minTokens = 3)
        .orderBy(col("doc_id"))
    }),

    // Strip-vs-history at substring granularity: even docs are the curated
    // history, odd docs the newcomers; every 5-token span a newcomer
    // shares with ANY historical doc is removed (the stream-safe broadcast
    // path, driven by the persisted window index).
    "q89_strip_vs_history" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val index = Dedup.buildWindowIndex(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", w = 5)
      Dedup.stripKnownWindows(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", index, w = 5)
        .orderBy(col("doc_id"))
    }),

    // CONTENT-DEFINED CHUNKING (r15): every doc gets one of three shared
    // boilerplate tails; CDC boundaries depend only on the local window
    // hash, so chunking SELF-SYNCHRONIZES inside the shared tail despite
    // every doc's different prefix — the property the gate proves (q326
    // shows the shared chunks dedup across ~167 docs each). The oracle
    // replays every boundary positionally (the 31-power window hash as
    // unicode() arithmetic) and slices chunks with lead()-delimited
    // spans; one drifted weight, offset, or mask fails the hash.
    "q325_cdc_chunks" -> ((s, d) => {
      val planted = Tables.documents(s, d).select(col("doc_id"),
        concat(coalesce(col("text"), lit("")), lit(" "),
          when(pmod(col("doc_id"), lit(3)) === 0, lit(PackShared.cdcBoiler0))
            .when(pmod(col("doc_id"), lit(3)) === 1, lit(PackShared.cdcBoiler1))
            .otherwise(lit(PackShared.cdcBoiler2))).as("text"))
      Dedup.cdcChunks(planted, "doc_id", "text", window = 4, maskBits = 6)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // q325's chunks deduplicated ACROSS documents: chunk hashes shared
    // by 2+ docs with doc/occurrence counts — the storage-dedup readout
    // (the boilerplate tails' synchronized chunks surface here).
    "q326_cdc_dup_chunks" -> ((s, d) => {
      val planted = Tables.documents(s, d).select(col("doc_id"),
        concat(coalesce(col("text"), lit("")), lit(" "),
          when(pmod(col("doc_id"), lit(3)) === 0, lit(PackShared.cdcBoiler0))
            .when(pmod(col("doc_id"), lit(3)) === 1, lit(PackShared.cdcBoiler1))
            .otherwise(lit(PackShared.cdcBoiler2))).as("text"))
      Dedup.cdcDuplicateChunks(planted, "doc_id", "text", window = 4, maskBits = 6)
        .orderBy(col("chunk_md5"))
    }),

    // INCREMENTAL CDC dedup (r15): the even half of the corpus is
    // chunked ONCE into a chunk index; the odd half arrives later and is
    // audited by CHUNK CONTAINMENT — shared boilerplate tails
    // re-synchronize, so every arrival has known chunks, and the drop
    // rule is the exact basis-point cross-multiplication
    // n_known·10000 >= 3000·n_chunks (no float ratio). The at-scale
    // story: history never re-chunks; arrivals pay one kernel pass +
    // one chunk-keyed join.
    "q329_cdc_incremental" -> ((s, d) => {
      val planted = Tables.documents(s, d).select(col("doc_id"),
        concat(coalesce(col("text"), lit("")), lit(" "),
          when(pmod(col("doc_id"), lit(3)) === 0, lit(PackShared.cdcBoiler0))
            .when(pmod(col("doc_id"), lit(3)) === 1, lit(PackShared.cdcBoiler1))
            .otherwise(lit(PackShared.cdcBoiler2))).as("text"))
      val index = Dedup.buildChunkIndex(
        planted.filter(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
      Dedup.cdcContainmentAudit(
          planted.filter(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text",
          index, thresholdBp = 3000)
        .orderBy(col("doc_id"))
    }),

    // Near-dup pairs -> dedup clusters: connected components by min-label
    // propagation over the exact Jaccard pair graph.
    "q43_dedup_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = Dedup.jaccardPairs(docs, "doc_id", "text").select("id_a", "id_b")
      Dedup.connectedComponents(docs.select(col("doc_id")), "doc_id", edges, "id_a", "id_b")
        .orderBy(col("doc_id"))
    }),

    // q43's clusters resolved the way production near-dedup actually
    // resolves them: keep the BEST copy per cluster (here: most tokens,
    // ties to the smallest id), not the minimum id. One (quality, -id)
    // max-struct aggregation per cluster — no window, no whole-cluster
    // collect, hot clusters cost nothing extra.
    "q114_dedup_keep_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = Dedup.jaccardPairs(docs, "doc_id", "text").select("id_a", "id_b")
      val clusters = Dedup.connectedComponents(
        docs.select(col("doc_id")), "doc_id", edges, "id_a", "id_b")
      Dedup.keepBestPerCluster(docs.select(col("doc_id"), col("text")), "doc_id",
        size(split(col("text"), " ")), clusters)
        .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Benchmark decontamination: docs sharing any 3-gram with the
    // "benchmark" slice (every 50th doc stands in for an eval set) are
    // flagged. The benchmark n-gram set broadcasts; the corpus side is one
    // scan + a count shuffle on doc_id.
    "q58_decontamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.flagContaminated(
        docs, "doc_id", "text",
        bench = docs.filter(col("doc_id") % 50 === 0), benchTextCol = "text")
        .orderBy(col("doc_id"))
    }),

    // Canary audit: two canary phrases planted (every 37th doc gets one,
    // every 41st the other — some docs both), detected by exact
    // substring scan against the literal watchlist.
    "q163_canary_audit" -> ((s, d) => {
      val canaryA = "CANARY-7f3a correlation horizon"
      val canaryB = "canary token deadbeef-42"
      val planted = Tables.documents(s, d).select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 37 === 0, lit(s" $canaryA")).otherwise(lit("")),
        when(col("doc_id") % 41 === 0, lit(s" $canaryB")).otherwise(lit(""))).as("text"))
      TextAnalysis.findCanaries(planted, "doc_id", "text", Seq(canaryA, canaryB))
        .orderBy(col("doc_id"), col("canary"))
    }),

    // Entity resolution: planted typo'd duplicates (every 10th customer
    // re-appears with 'Customer#' misspelled at distance 2) linked by
    // blocking on (nation, segment) + bounded Levenshtein verify — the
    // Fellegi-Sunter two-phase shape; cross-block pairs are never compared.
    "q148_entity_resolution" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))
      val dirty = c.filter(col("c_custkey") % 10 === 0)
        .select((col("c_custkey") + 1000000).as("c_custkey"),
          regexp_replace(col("c_name"), "Customer#", "Custmr#").as("c_name"),
          col("c_nationkey"), col("c_mktsegment"))
      Dedup.blockedEntityPairs(c.unionByName(dirty), "c_custkey", "c_name",
        Seq("c_nationkey", "c_mktsegment"), maxDistance = 2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Entity resolution END TO END — q148's verified pairs composed through
    // connected components into entity clusters, then best-copy survivorship
    // (clean-name records outrank mangled ones, ties to the lowest key):
    // one canonical record per real-world entity plus its cluster size —
    // the full production record-linkage contract, not just the pair list.
    // All three stages are the existing operators; nothing new to scale.
    "q168_er_canonical" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))
      val dirty = c.filter(col("c_custkey") % 10 === 0)
        .select((col("c_custkey") + 1000000).as("c_custkey"),
          regexp_replace(col("c_name"), "Customer#", "Custmr#").as("c_name"),
          col("c_nationkey"), col("c_mktsegment"))
      val all = c.unionByName(dirty)
      val pairs = Dedup.blockedEntityPairs(all, "c_custkey", "c_name",
        Seq("c_nationkey", "c_mktsegment"), maxDistance = 2)
        .select(col("id_a"), col("id_b"))
      val clusters = Dedup.connectedComponents(
        all.select(col("c_custkey")), "c_custkey", pairs, "id_a", "id_b")
      val survivors = Dedup.keepBestPerCluster(all, "c_custkey",
        when(col("c_name").startsWith("Customer#"), 1).otherwise(0), clusters)
      // cluster and cluster-size frames are corpus-shaped (one row per
      // entity record / per cluster) — SMJ-pinned like every derived
      // frame in the dedup family; PlanAudit rejects the size estimate
      // Spark would otherwise broadcast on
      survivors
        .join(clusters.hint("shuffle_merge"), Seq("c_custkey"))
        .join(clusters.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_members"))
          .hint("shuffle_merge"),
          Seq("cluster_id"))
        .select(col("c_custkey").as("entity_id"), col("c_name"), col("n_members"))
        .orderBy(col("entity_id"))
    }),

    // Winnowing fingerprint selection (the MOSS algorithm) at k=5/w=4:
    // each 4-window of 5-gram hashes contributes its min (rightmost on
    // ties) — the sublinear substring-dedup index, ~2/(w+1) the density
    // of indexing every window, over the portable 60-bit md5 hash.
    "q204_winnowing" -> ((s, d) => {
      Dedup.winnowingFingerprints(Tables.documents(s, d), "doc_id", "text",
        k = 5, w = 4)
        .orderBy(col("doc_id"), col("pos"), col("wh"))
    }),

    // Dedup-cluster size distribution: the post-dedup report card — how
    // many clusters of each size, how many docs they cover (q43's CC
    // composed into the histogram a curation run publishes).
    "q196_dup_cluster_stats" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = Dedup.jaccardPairs(docs, "doc_id", "text").select("id_a", "id_b")
      val clusters = Dedup.connectedComponents(
        docs.select(col("doc_id")), "doc_id", edges, "id_a", "id_b")
      clusters.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
        .select(col("cluster_size"), col("n_clusters"),
          (col("cluster_size") * col("n_clusters")).as("n_docs"))
        .orderBy(col("cluster_size"))
    }),

    // Prefix-filtered EXACT set-similarity join (AllPairs/PPJoin family):
    // q25's pair set reproduced through a rarity-ordered prefix candidate
    // scheme instead of the full inverted index — the same oracle proves
    // the rewrite exact (the q48 ≡ q31 move for exact Jaccard).
    "q194_ppjoin" -> ((s, d) => {
      Dedup.jaccardPairsPrefixFiltered(Tables.documents(s, d), "doc_id", "text",
        shingleN = 3, tauNum = 1, tauDen = 2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Incremental connected components: even docs clustered first (their
    // own pairs only), odd docs merged in via label edges + only the
    // NEW pairs — labels must equal q43's from-scratch run over the full
    // pair list bit for bit (the oracle IS q43's).
    "q147_incremental_cc" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val oldDocs = docs.filter(col("doc_id") % 2 === 0)
      val oldCC = Dedup.connectedComponents(oldDocs.select(col("doc_id")), "doc_id",
        Dedup.jaccardPairs(oldDocs, "doc_id", "text").select(col("id_a"), col("id_b")),
        "id_a", "id_b")
      val newEdges = Dedup.jaccardPairs(docs, "doc_id", "text")
        .filter(col("id_a") % 2 === 1 || col("id_b") % 2 === 1)
        .select(col("id_a"), col("id_b"))
      Dedup.incrementalConnectedComponents(oldCC, "doc_id",
        docs.filter(col("doc_id") % 2 === 1).select(col("doc_id")),
        newEdges, "id_a", "id_b")
        .orderBy(col("doc_id"))
    }),
  )

  /** The shared q325/q326/q329 oracle CTE chain: planted boilerplate
    * tails, every CDC boundary replayed positionally (1-based p in
    * [4, n−1], window chars p−3..p weighted 31³..31⁰, mask 63), chunks
    * as lead()-delimited spans from the boundary starts. `pred` filters
    * the document slice; `sfx` disambiguates CTE names when two chains
    * coexist (q329's old/new halves). */
  private def cdcOracleChain(pred: String = "true", sfx: String = ""): String =
    s"""planted$sfx AS (SELECT doc_id,
       |    coalesce(text, '') || ' ' ||
       |    (CASE CAST(doc_id % 3 AS INTEGER)
       |       WHEN 0 THEN '${PackShared.cdcBoiler0}'
       |       WHEN 1 THEN '${PackShared.cdcBoiler1}'
       |       ELSE '${PackShared.cdcBoiler2}' END) AS t
       |  FROM documents WHERE $pred),
       |pos$sfx AS (SELECT doc_id, t, unnest(range(4, len(t))) AS p FROM planted$sfx),
       |b$sfx AS (SELECT doc_id, p FROM pos$sfx
       |      WHERE (CAST(unicode(substr(t, p - 3, 1)) AS BIGINT) * 29791
       |           + CAST(unicode(substr(t, p - 2, 1)) AS BIGINT) * 961
       |           + CAST(unicode(substr(t, p - 1, 1)) AS BIGINT) * 31
       |           + CAST(unicode(substr(t, p, 1)) AS BIGINT)) % 64 = 0),
       |starts$sfx AS (SELECT doc_id, 1 AS s FROM planted$sfx
       |           UNION ALL SELECT doc_id, p + 1 FROM b$sfx),
       |st$sfx AS (SELECT doc_id, s,
       |              row_number() OVER (PARTITION BY doc_id ORDER BY s) AS ci,
       |              lead(s) OVER (PARTITION BY doc_id ORDER BY s) AS nxt
       |       FROM starts$sfx),
       |ch$sfx AS (SELECT st.doc_id, st.ci AS chunk_idx, st.s AS start,
       |              coalesce(st.nxt - 1, len(p.t)) - st.s + 1 AS len,
       |              md5(substr(p.t, st.s, coalesce(st.nxt - 1, len(p.t)) - st.s + 1))
       |                AS chunk_md5
       |       FROM st$sfx st JOIN planted$sfx p USING (doc_id))""".stripMargin

  def oracles: Map[String, String] = Map(
    // q329: two chains (old/new halves), the known set from the old
    // chunks, per-new-doc counts and the exact basis-point drop rule.
    "q329_cdc_incremental" -> s"""
      WITH ${cdcOracleChain("doc_id % 2 = 0", "o")},
      ${cdcOracleChain("doc_id % 2 = 1", "n")},
      known AS (SELECT DISTINCT chunk_md5 FROM cho)
      SELECT c.doc_id,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(count(k.chunk_md5) AS BIGINT) AS n_known,
             (count(k.chunk_md5) * 10000 >= 3000 * count(*)) AS is_dropped
      FROM chn c LEFT JOIN known k USING (chunk_md5)
      GROUP BY c.doc_id ORDER BY c.doc_id""",

    // q325: every chunk span + md5 from the positional boundary replay.
    "q325_cdc_chunks" -> s"""
      WITH ${cdcOracleChain()}
      SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
             CAST(start AS BIGINT) AS start, CAST(len AS BIGINT) AS len,
             chunk_md5
      FROM ch ORDER BY doc_id, chunk_idx""",

    // q326: the cross-document duplicated-chunk readout off the same
    // chain.
    "q326_cdc_dup_chunks" -> s"""
      WITH ${cdcOracleChain()}
      SELECT chunk_md5,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_occurrences
      FROM ch GROUP BY chunk_md5 HAVING count(DISTINCT doc_id) >= 2
      ORDER BY chunk_md5""",

    "q163_canary_audit" -> """
      WITH planted AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 37 = 0 THEN ' CANARY-7f3a correlation horizon' ELSE '' END
                    || CASE WHEN doc_id % 41 = 0 THEN ' canary token deadbeef-42' ELSE '' END AS text
        FROM documents),
      hits AS (
        SELECT doc_id, 'CANARY-7f3a correlation horizon' AS canary FROM planted
        WHERE contains(text, 'CANARY-7f3a correlation horizon')
        UNION ALL
        SELECT doc_id, 'canary token deadbeef-42' FROM planted
        WHERE contains(text, 'canary token deadbeef-42'))
      SELECT doc_id, canary FROM hits ORDER BY doc_id, canary""",

    "q148_entity_resolution" -> """
      WITH c AS (SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer),
      dirty AS (SELECT c_custkey + 1000000 AS c_custkey,
                       replace(c_name, 'Customer#', 'Custmr#') AS c_name,
                       c_nationkey, c_mktsegment
                FROM customer WHERE c_custkey % 10 = 0),
      a AS (SELECT * FROM c UNION ALL SELECT * FROM dirty),
      pairs AS (
        SELECT x.c_custkey AS id_a, y.c_custkey AS id_b,
               levenshtein(substring(x.c_name, 1, 256), substring(y.c_name, 1, 256)) AS edit_dist,
               greatest(len(substring(x.c_name, 1, 256)), len(substring(y.c_name, 1, 256))) AS ml
        FROM a x JOIN a y
          ON x.c_nationkey = y.c_nationkey AND x.c_mktsegment = y.c_mktsegment
         AND x.c_custkey < y.c_custkey)
      SELECT id_a, id_b, CAST(edit_dist AS INTEGER) AS edit_dist,
             CASE WHEN ml = 0 THEN 1.0
                  ELSE round(1.0 - CAST(edit_dist AS DOUBLE) / ml, 4) END AS similarity
      FROM pairs WHERE edit_dist <= 2 ORDER BY id_a, id_b""",

    // q148's pairs -> recursive-CTE connected components -> best-copy
    // survivorship (clean 'Customer#' names outrank mangled, ties lowest
    // key) -> one canonical record per entity + cluster size.
    "q168_er_canonical" -> """
      WITH RECURSIVE c AS (SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer),
      dirty AS (SELECT c_custkey + 1000000 AS c_custkey,
                       replace(c_name, 'Customer#', 'Custmr#') AS c_name,
                       c_nationkey, c_mktsegment
                FROM customer WHERE c_custkey % 10 = 0),
      a AS (SELECT * FROM c UNION ALL SELECT * FROM dirty),
      pairs AS (
        SELECT x.c_custkey AS id_a, y.c_custkey AS id_b
        FROM a x JOIN a y
          ON x.c_nationkey = y.c_nationkey AND x.c_mktsegment = y.c_mktsegment
         AND x.c_custkey < y.c_custkey
        WHERE levenshtein(substring(x.c_name, 1, 256), substring(y.c_name, 1, 256)) <= 2),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs),
      walk(id, label) AS (
        SELECT c_custkey, c_custkey FROM a
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON w.id = e.src),
      cl AS (SELECT id AS c_custkey, min(label) AS cluster_id FROM walk GROUP BY id),
      sz AS (SELECT cluster_id, count(*) AS n_members FROM cl GROUP BY cluster_id),
      q AS (SELECT a.c_custkey, a.c_name, cl.cluster_id,
                   CASE WHEN a.c_name LIKE 'Customer#%' THEN 1 ELSE 0 END AS qual
            FROM a JOIN cl USING (c_custkey)),
      win AS (SELECT c_custkey, c_name, cluster_id,
                     row_number() OVER (PARTITION BY cluster_id
                                        ORDER BY qual DESC, c_custkey) AS rn
              FROM q)
      SELECT w.c_custkey AS entity_id, w.c_name, sz.n_members
      FROM win w JOIN sz USING (cluster_id)
      WHERE w.rn = 1 ORDER BY entity_id""",

    "q147_incremental_cc" -> """
      WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
                    ELSE [array_to_string(w, ' ')] END AS s
        FROM toks),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE 2 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs),
      walk(id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON w.id = e.src)
      SELECT id AS doc_id, min(label) AS cluster_id
      FROM walk GROUP BY id ORDER BY doc_id""",

    // Same n-gram construction as the q39 oracle (3-grams, short docs fall
    // back to the whole text); benchmark = every 50th doc. The Spark side
    // counts DISTINCT matched n-grams, so doc grams are list_distinct'd
    // before the join.
    "q58_decontamination" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
                    ELSE [array_to_string(w, ' ')] END AS s
        FROM toks),
      bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 50 = 0),
      dg AS (SELECT doc_id, unnest(s) AS g FROM sh),
      m AS (SELECT dg.doc_id, count(*) AS matched
            FROM dg JOIN bench USING (g) GROUP BY dg.doc_id)
      SELECT d.doc_id,
             CAST(coalesce(m.matched, 0) AS INTEGER) AS matched_ngrams,
             coalesce(m.matched, 0) >= 1 AS contaminated
      FROM documents d LEFT JOIN m USING (doc_id)
      ORDER BY d.doc_id""",

    // Keep-first line dedup over the identical planted construction; the
    // oracle's row_number window and the operator's min-struct aggregate
    // select the same (doc_id, pos) representative.
    "q62_line_dedup" -> """
      WITH docs AS (
        SELECT doc_id,
               'promo ' || CAST(doc_id % 7 AS VARCHAR) || ' header' || chr(10)
               || text || chr(10)
               || 'subscribe to our newsletter today' || chr(10)
               || '-- footer' AS text
        FROM documents),
      lines AS (
        SELECT doc_id,
               unnest(string_split(text, chr(10))) AS line,
               unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
        FROM docs),
      ranked AS (
        SELECT doc_id, pos, line,
               len(string_split(line, ' ')) >= 3 AS eligible,
               row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
        FROM lines),
      kept AS (SELECT doc_id, pos, line FROM ranked WHERE NOT eligible OR rn = 1)
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
      FROM kept GROUP BY doc_id ORDER BY doc_id""",

    // Exact pairwise Jaccard over new-x-old only (the q25/q39 shingle
    // derivation; the planted +100000 ids replay the query's construction).
    "q74_index_neardup" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
                    ELSE [array_to_string(w, ' ')] END AS s
        FROM toks),
      newc AS (SELECT doc_id + 100000 AS id_a, s FROM sh WHERE doc_id % 20 = 0),
      pairs AS (
        SELECT n.id_a, o.doc_id AS id_b,
               len(list_intersect(n.s, o.s)) AS inter_cnt,
               len(n.s) + len(o.s) - len(list_intersect(n.s, o.s)) AS union_cnt
        FROM newc n CROSS JOIN sh o)
      SELECT id_a, id_b,
             CAST(inter_cnt AS INTEGER) AS inter_cnt,
             CAST(union_cnt AS INTEGER) AS union_cnt
      FROM pairs WHERE 2 * inter_cnt >= union_cnt
      ORDER BY id_a, id_b""",

    // NOT EXISTS is the anti-join; md5 agrees between engines and text is
    // non-null, so there is no NOT IN null hazard to dodge.
    "q75_index_exact_dedup" -> """
      WITH newc AS (
        SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 4 = 0
        UNION ALL
        SELECT doc_id + 200000 AS doc_id, text || ' revised edition' AS text
        FROM documents WHERE doc_id % 4 = 1)
      SELECT doc_id, text FROM newc n
      WHERE NOT EXISTS (
        SELECT 1 FROM documents o WHERE md5(o.text) = md5(n.text))
      ORDER BY doc_id""",

    // The from-scratch index the incremental generations must converge to;
    // over_admitted is 0 exactly when every re-arrival was dropped.
    "q83_index_lifecycle" -> """
      SELECT md5(text) AS fp, CAST(0 AS BIGINT) AS over_admitted
      FROM documents GROUP BY md5(text)
      ORDER BY fp""",

    // Replays the deterministic plant, then strips the two listed lines
    // with list functions (chr(10) = the Spark-side '\n' literal).
    "q72_strip_lines" -> """
      WITH p AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN 'all rights reserved' || chr(10) || text || chr(10) ||
                         'subscribe to our newsletter today'
                    WHEN doc_id % 5 = 0 THEN text || chr(10) || 'all rights reserved'
                    ELSE text END AS text
        FROM documents)
      SELECT doc_id,
             array_to_string(
               list_filter(string_split(text, chr(10)),
                 l -> l <> 'subscribe to our newsletter today'
                  AND l <> 'all rights reserved'),
               chr(10)) AS text
      FROM p ORDER BY doc_id""",
    "q32_dedup_simhash" -> simhashOracle,

    "q119_simhash_idf" -> simhashWeightedOracle,

    "q122_semantic_decon" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ev AS (SELECT v FROM e WHERE vec_id < 10)
      SELECT c.vec_id FROM e c
      WHERE NOT EXISTS (
        SELECT 1 FROM ev WHERE round(list_cosine_similarity(c.v, ev.v), 6) >= 0.3)
      ORDER BY c.vec_id""",

    "q124_containment" -> """
      WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000,
               array_to_string(list_slice(string_split(text, ' '), 1, 12), ' ')
        FROM documents WHERE doc_id % 10 = 0),
      toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM base),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
                    ELSE [array_to_string(w, ' ')] END AS s
        FROM toks),
      p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.s, b.s)) AS inter_cnt,
               len(a.s) AS sz_a, len(b.s) AS sz_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT id_a, id_b, CAST(inter_cnt AS INTEGER) AS inter_cnt,
             CAST(sz_a AS INTEGER) AS sz_a, CAST(sz_b AS INTEGER) AS sz_b,
             round(inter_cnt * 1.0 / sz_a, 4) AS cont_a,
             round(inter_cnt * 1.0 / sz_b, 4) AS cont_b
      FROM p
      WHERE inter_cnt * 10 >= sz_a * 9 OR inter_cnt * 10 >= sz_b * 9
      ORDER BY id_a, id_b""",

    // q204: per-doc 5-gram md5-60 hashes, every 4-window's min (rightmost
    // tie via max(pos) among the window's min-hash rows), short docs fall
    // back to the global min, distinct (pos, hash) pairs.
    "q204_winnowing" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      h AS (SELECT doc_id, p - 1 AS pos,
                   CAST(concat('0x', substring(md5(array_to_string(list_slice(w, p, p + 4), ' ')), 1, 15)) AS BIGINT) AS wh,
                   len(w) - 4 AS m
            FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS p
                  FROM t WHERE len(w) >= 5)),
      starts AS (SELECT doc_id, unnest(generate_series(0, greatest(m - 4, 0))) AS st
                 FROM (SELECT DISTINCT doc_id, m FROM h)),
      mn AS (SELECT s.doc_id, s.st, min(h.wh) AS mwh
             FROM starts s JOIN h ON h.doc_id = s.doc_id AND h.pos BETWEEN s.st AND s.st + 3
             GROUP BY s.doc_id, s.st),
      sel AS (SELECT mn.doc_id, max(h.pos) AS pos, mn.mwh AS wh
              FROM mn JOIN h ON h.doc_id = mn.doc_id
                            AND h.pos BETWEEN mn.st AND mn.st + 3 AND h.wh = mn.mwh
              GROUP BY mn.doc_id, mn.st, mn.mwh)
      SELECT DISTINCT doc_id, CAST(pos AS INTEGER) AS pos, wh
      FROM sel ORDER BY doc_id, pos, wh""",
    "q24_dedup_exact" -> """
      SELECT min(doc_id) AS keep_id, count(*) AS copies
      FROM documents GROUP BY text ORDER BY keep_id""",

    // Exact all-pairs Jaccard over distinct 3-gram shingles: feasible at
    // sf0.01 (500 docs); the Spark side must produce the identical set via
    // LSH bucketing + verification.
    "q25_dedup_near" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
                    ELSE [array_to_string(w, ' ')] END AS s
        FROM toks),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.s, b.s)) AS inter_cnt,
               len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS union_cnt
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT id_a, id_b,
             CAST(inter_cnt AS INTEGER) AS inter_cnt,
             CAST(union_cnt AS INTEGER) AS union_cnt
      FROM pairs WHERE 2 * inter_cnt >= union_cnt
      ORDER BY id_a, id_b""",

    // q43's recursive CC composed into the cluster-size histogram.
    "q196_dup_cluster_stats" -> """
      WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
                    ELSE [array_to_string(w, ' ')] END AS s
        FROM toks),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE 2 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs),
      walk(id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON w.id = e.src),
      cl AS (SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id),
      sz AS (SELECT cluster_id, count(*) AS cluster_size FROM cl GROUP BY cluster_id)
      SELECT cluster_size, count(*) AS n_clusters,
             CAST(cluster_size * count(*) AS BIGINT) AS n_docs
      FROM sz GROUP BY cluster_size ORDER BY cluster_size""",

    // identical to q25's exact all-pairs oracle: the prefix-filtered
    // candidate scheme must reproduce the full inverted index's answer.
    "q194_ppjoin" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
                    ELSE [array_to_string(w, ' ')] END AS s
        FROM toks),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.s, b.s)) AS inter_cnt,
               len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS union_cnt
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT id_a, id_b,
             CAST(inter_cnt AS INTEGER) AS inter_cnt,
             CAST(union_cnt AS INTEGER) AS union_cnt
      FROM pairs WHERE 2 * inter_cnt >= union_cnt
      ORDER BY id_a, id_b""",

    "q30_fingerprint" -> """
      WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(w, x -> CAST(concat('0x', substring(md5(x), 1, 6)) AS BIGINT))),
               (acc, h) -> (acc * 131 + h) % 1000000007) AS fp_rolling,
             md5(text) AS fp_md5
      FROM t ORDER BY doc_id""",

    // Same all-pairs oracle as q25 — the LSH path and the inverted-index
    // path must both reproduce the exact answer.
    "q39_ngram_jaccard" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
                    ELSE [array_to_string(w, ' ')] END AS s
        FROM toks),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.s, b.s)) AS inter_cnt,
               len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS union_cnt
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT id_a, id_b,
             CAST(inter_cnt AS INTEGER) AS inter_cnt,
             CAST(union_cnt AS INTEGER) AS union_cnt
      FROM pairs WHERE 2 * inter_cnt >= union_cnt
      ORDER BY id_a, id_b""",

    // Rebuilds the DECODED pixel grid closed-form (the synthetic generator's
    // mix32 chain — xor(h, h // 2^s) is h ^ (h >>> s) on these nonnegative
    // BIGINTs), then mirrors the Spark luminance kernel's exact double
    // expression tree — (0.299*g + 0.587*g + 0.114*g)/255, left-assoc —
    // and the Float cast (CAST AS REAL), so the feature lists are
    // bit-identical before the all-pairs cosine.
    "q84_image_neardup" -> """
      WITH base AS (SELECT doc_id AS seed FROM documents WHERE doc_id % 10 = 0),
      imgs AS (
        SELECT seed AS media_id, seed, FALSE AS pert FROM base
        UNION ALL
        SELECT seed + 1000000 AS media_id, seed, TRUE AS pert
        FROM base WHERE seed % 20 = 0),
      hx AS (
        SELECT i.media_id, i.pert, k.k,
               ((i.seed+1)*4096 + (k.k+2)) % 4294967296 AS h
        FROM imgs i, (SELECT unnest(range(0, 64)) AS k) k),
      h1 AS (SELECT media_id, pert, k, xor(h, h // 65536) AS h FROM hx),
      h2 AS (SELECT media_id, pert, k, (h * 49632349) % 4294967296 AS h FROM h1),
      h3 AS (SELECT media_id, pert, k, xor(h, h // 8192) AS h FROM h2),
      h4 AS (SELECT media_id, pert, k, (h * 85624441) % 4294967296 AS h FROM h3),
      h5 AS (SELECT media_id, pert, k, xor(h, h // 65536) AS h FROM h4),
      px AS (
        SELECT media_id, k,
               CASE WHEN pert AND k = 0
                    THEN CASE WHEN 1 + h % 255 <= 247 THEN 1 + h % 255 + 8
                              ELSE 1 + h % 255 - 8 END
                    ELSE 1 + h % 255 END AS g
        FROM h5),
      feats AS (
        SELECT media_id,
               list(CAST((0.299*g + 0.587*g + 0.114*g)/255 AS REAL) ORDER BY k) AS v
        FROM px GROUP BY media_id),
      e AS (SELECT media_id AS vec_id, CAST(v AS DOUBLE[]) AS v FROM feats)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.99
      ORDER BY id_a, id_b""",

    "q85_dup_window_stats" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      wins AS (
        SELECT doc_id, p, array_to_string(list_slice(w, p, p + 4), ' ') AS win
        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS p
              FROM toks WHERE len(w) >= 5)),
      dup AS (SELECT win FROM wins GROUP BY win HAVING min(doc_id) <> max(doc_id)),
      per AS (SELECT doc_id, count(*) AS dp, count(DISTINCT win) AS dd
              FROM wins WHERE win IN (SELECT win FROM dup) GROUP BY doc_id)
      SELECT d.doc_id,
             CAST(greatest(len(string_split(d.text, ' ')) - 4, 0) AS BIGINT) AS n_windows,
             CAST(coalesce(per.dp, 0) AS BIGINT) AS dup_positions,
             CAST(coalesce(per.dd, 0) AS BIGINT) AS dup_distinct
      FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id""",

    "q86_strip_dup_windows" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      wins AS (
        SELECT doc_id, p, array_to_string(list_slice(w, p, p + 4), ' ') AS win
        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS p
              FROM toks WHERE len(w) >= 5)),
      dup AS (SELECT win FROM wins GROUP BY win HAVING min(doc_id) <> max(doc_id)),
      cov AS (SELECT doc_id, list(DISTINCT i) AS cv FROM (
                SELECT doc_id, unnest(generate_series(p, p + 4)) AS i
                FROM wins WHERE win IN (SELECT win FROM dup)) GROUP BY doc_id),
      stripped AS (
        -- a comprehension with zero survivors yields NULL, not []: coalesce
        -- it to '' here so the outer coalesce only handles docs with no
        -- duplicated windows at all (a fully-stripped doc must become '')
        SELECT t.doc_id,
               coalesce(array_to_string([t.w[i] for i in range(1, len(t.w) + 1)
                                         if NOT list_contains(c.cv, i)], ' '), '') AS text2
        FROM toks t JOIN cov c USING (doc_id))
      SELECT d.doc_id, coalesce(s.text2, d.text) AS text
      FROM documents d LEFT JOIN stripped s USING (doc_id) ORDER BY d.doc_id""",

    "q118_url_dedup" -> """
      WITH u AS (
        SELECT doc_id,
               CASE doc_id % 4
                 WHEN 0 THEN 'HTTP://WWW.example' || (doc_id % 50) ||
                             '.com/Path/A/?b=2&a=1&utm_source=x#frag'
                 WHEN 1 THEN 'https://example' || (doc_id % 50) || '.com/Path/A?a=1&b=2'
                 WHEN 2 THEN 'http://Example' || (doc_id % 50) || '.com:80/Path/A/'
                 ELSE 'https://www.example' || (doc_id % 50) || '.com/Path/A#top'
               END AS url
        FROM documents),
      s1 AS (SELECT doc_id, regexp_replace(trim(url), '#.*', '') AS x FROM u),
      s2 AS (SELECT doc_id, regexp_replace(x, '(?i)^https?://', '') AS x FROM s1),
      s3 AS (SELECT doc_id,
                    regexp_replace(regexp_replace(
                      lower(regexp_extract(x, '^([^/?]*)', 1)), '^www\.', ''),
                      ':(80|443)$', '') AS host,
                    regexp_replace(x, '^[^/?]*', '') AS rest
             FROM s2),
      s4 AS (SELECT doc_id, host,
                    regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$', '') AS path,
                    regexp_extract(rest, '\?(.*)', 1) AS q
             FROM s3),
      s5 AS (SELECT doc_id, host, path,
                    array_to_string(list_sort(list_filter(string_split(q, '&'),
                      p -> NOT (starts_with(p, 'utm_') OR p = ''))), '&') AS sq
             FROM s4),
      canon AS (SELECT doc_id,
                       host || path ||
                       CASE WHEN len(sq) > 0 THEN '?' || sq ELSE '' END AS canonical
                FROM s5),
      k AS (SELECT canonical, min(doc_id) AS doc_id FROM canon GROUP BY canonical)
      SELECT doc_id, canonical FROM k ORDER BY doc_id""",

    "q94_line_dedup_within" -> """
      WITH lined AS (
        SELECT doc_id,
               'repeated header line x' || chr(10) || text || chr(10) || '--' ||
               chr(10) || 'repeated header line x' || chr(10) || text ||
               chr(10) || '--' AS text
        FROM documents),
      split_l AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM lined)
      SELECT doc_id,
             array_to_string(
               [l[i] for i in range(1, len(l) + 1)
                     if len(string_split(l[i], ' ')) < 3 OR list_position(l, l[i]) = i],
               chr(10)) AS text
      FROM split_l ORDER BY doc_id""",

    "q89_strip_vs_history" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      hist AS (
        SELECT DISTINCT array_to_string(list_slice(w, p, p + 4), ' ') AS win
        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS p
              FROM toks WHERE len(w) >= 5 AND doc_id % 2 = 0)),
      wins AS (
        SELECT doc_id, p, array_to_string(list_slice(w, p, p + 4), ' ') AS win
        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS p
              FROM toks WHERE len(w) >= 5 AND doc_id % 2 = 1)),
      cov AS (SELECT doc_id, list(DISTINCT i) AS cv FROM (
                SELECT doc_id, unnest(generate_series(p, p + 4)) AS i
                FROM wins WHERE win IN (SELECT win FROM hist)) GROUP BY doc_id),
      stripped AS (
        SELECT t.doc_id,
               coalesce(array_to_string([t.w[i] for i in range(1, len(t.w) + 1)
                                         if NOT list_contains(c.cv, i)], ' '), '') AS text2
        FROM toks t JOIN cov c USING (doc_id))
      SELECT d.doc_id, coalesce(s.text2, d.text) AS text
      FROM documents d LEFT JOIN stripped s USING (doc_id)
      WHERE d.doc_id % 2 = 1 ORDER BY d.doc_id""",

    // Connected components of the exact-Jaccard near-dup graph via a
    // recursive CTE: `walk` enumerates (vertex, reachable-vertex) pairs and
    // the min over reachable ids is the component label.
    "q43_dedup_clusters" -> """
      WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
                    ELSE [array_to_string(w, ' ')] END AS s
        FROM toks),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE 2 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs),
      walk(id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON w.id = e.src)
      SELECT id AS doc_id, min(label) AS cluster_id
      FROM walk GROUP BY id ORDER BY doc_id""",

    // q43's recursive-CC oracle, resolved by best-copy selection: the
    // per-cluster winner maximizes (token count, -doc_id) — same rule,
    // expressed as a row_number over (nt DESC, doc_id).
    "q114_dedup_keep_best" -> """
      WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sh AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
                    ELSE [array_to_string(w, ' ')] END AS s
        FROM toks),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE 2 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs),
      walk(id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON w.id = e.src),
      cl AS (SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id),
      q AS (SELECT doc_id, len(string_split(text, ' ')) AS nt FROM documents),
      win AS (SELECT cl.doc_id, row_number() OVER (
                PARTITION BY cl.cluster_id ORDER BY q.nt DESC, cl.doc_id) AS rn
              FROM cl JOIN q USING (doc_id))
      SELECT w.doc_id, CAST(q.nt AS INTEGER) AS n_tokens
      FROM win w JOIN q ON w.doc_id = q.doc_id
      WHERE w.rn = 1 ORDER BY w.doc_id""",
  )
}
