package graft.queries

import graft.Tables
import graft.operators.{AsofJoin, Chunking, Dedup, Multimodal, Profiler, RangeJoin, Rollup, Sampling, Similarity, Sketches, Skew, TextAnalysis, TimeSeries, Tokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators over `documents` and `embeddings`:
  * dedup (exact, MinHash-LSH, SimHash), similarity search (exact brute-force
  * + LSH-bucketed ANN), and text analysis. Oracle-checkable entries emit
  * integer counts or exactly-representable doubles; the intrinsically
  * approximate ops (SimHash pairs, LSH ANN) have no SQL oracle and take the
  * driver's rows-only check.
  */
object DataPipelinePack extends QueryPack {

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

    // Exact ANN baseline: top-5 cosine neighbors of probes vec_id < 10.
    "q26_ann_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
        vectors = e, vectorId = "vec_id", vectorCol = "embedding",
        probes = e.filter(col("vec_id") < 10), probeId = "vec_id", probeCol = "embedding",
        k = 5)
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // Per-document quality metrics (integer counts + exact ratios).
    "q27_text_quality" -> ((s, d) => {
      TextAnalysis.qualityMetrics(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Stopword-profile language scoring with deterministic argmax.
    "q28_lang_id" -> ((s, d) => {
      TextAnalysis.languageScores(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Whitespace + BPE-ish subword token counting.
    "q29_token_counts" -> ((s, d) => {
      TextAnalysis.tokenCounts(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Order-sensitive rolling-hash + md5 content fingerprints.
    "q30_fingerprint" -> ((s, d) => {
      TextAnalysis.fingerprints(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Embedding-cosine near-dup pairs (exact; low threshold — the corpus has
    // no high-cosine planted pairs).
    "q31_cosine_pairs" -> ((s, d) => {
      Similarity.cosineNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding", 0.3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // The LSH-bucketed scale path for q31: banded sign-LSH candidates +
    // exact verification. Gate = EQUALITY with the all-pairs oracle (the
    // band parameters give measured recall 1 on this corpus, and
    // verification makes precision exactly 1), through a bucket-join plan
    // with no BroadcastNestedLoopJoin.
    "q48_cosine_pairs_lsh" -> ((s, d) => {
      Similarity.cosineNearDupPairsLsh(Tables.embeddings(s, d), "vec_id", "embedding",
        threshold = 0.3, dim = 64, bandBits = 3, bands = 32)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // q48 at the PRODUCTION configuration (bandBits 8 / 16 bands / tau 0.8
    // — the docstring's 100 TB sizing, not the recall-1 gate shape), on a
    // corpus with planted near-threshold twins, reporting MEASURED recall.
    // Each vec_id % 5 == 0 vector gets a deterministic twin at cosine
    // ~ 1/sqrt(1+beta^2) ~ 0.86 (relative +/-beta sign-flip perturbation),
    // straddling the tau = 0.8 band where sign-LSH recall is weakest.
    // Output: ONE summary row (planted, eligible truth pairs at tau, found,
    // recall, total LSH pairs). Recall is intrinsically sub-1 here, but the
    // whole computation is DETERMINISTIC (fixed planes, fixed perturbation),
    // so the measurement itself is oracle-expressible: lshProdRecallOracle
    // re-derives the planted corpus, every band bucket (from the published
    // plane literals), the verified pair set, and the truth pairs in DuckDB
    // and reproduces this exact summary row. The >= 0.95 recall floor is
    // additionally pinned by DedupSimilaritySpec.
    "q61_cosine_lsh_prod" -> ((s, d) => {
      val idOffset = 100000000L
      val beta = 0.6
      val base = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      // `__orig` keeps the perturbation seed UNAMBIGUOUS: referencing
      // `vec_id` inside the lambda of the same select that re-aliases
      // `vec_id` resolves to the ALIASED (offset) id — measured, and too
      // subtle a binding rule to hang a cross-engine oracle on.
      val planted = base.filter(pmod(col("vec_id"), lit(5)) === 0)
        .select(col("vec_id").as("__orig"), col("embedding"))
        .select((col("__orig") + idOffset).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x * (lit(1.0) + lit(beta) * signum(sin(col("__orig") * 37 + i))))
              .cast("float")).as("embedding"))
      val corpus = base.unionByName(planted)
      val found = Similarity.cosineNearDupPairsLsh(corpus, "vec_id", "embedding",
        threshold = 0.8, dim = 64, bandBits = 8, bands = 16)
      // ground truth costs ONE 1:1 join (n rows, never all-pairs): each
      // twin's exact cosine, thresholded the same way the operator rounds
      val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
        aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), _ + _)
      val truth = base.select(col("vec_id").as("id_a"), col("embedding").as("__ea"))
        .join(planted.select((col("vec_id") - idOffset).as("id_a"),
          col("vec_id").as("id_b"), col("embedding").as("__eb")), Seq("id_a"))
        .withColumn("__cos",
          dot(col("__ea"), col("__eb")) /
            (sqrt(dot(col("__ea"), col("__ea"))) * sqrt(dot(col("__eb"), col("__eb")))))
      val eligible = truth.filter(round(col("__cos"), 6) >= 0.8)
        .select(col("id_a"), col("id_b"))
      // ONE structural pass over the expensive LSH subtree: a left join
      // against the (unique-pair) truth set makes lsh_pairs a count(*) and
      // found a flag-count of the same scan. Measured parity with the
      // earlier semi-join + separate-count form (AQE's exchange reuse was
      // already deduplicating the shared shuffles); this shape makes the
      // single-scan guarantee structural instead of optimizer-dependent.
      // eligible is SMJ-pinned: a join derivative with a garbage static
      // size estimate.
      val foundAgg = found
        .join(eligible.withColumn("__e", lit(1)).hint("shuffle_merge"),
          Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("lsh_pairs"), count(col("__e")).as("found"))
      truth.agg(count(lit(1)).as("planted"),
          count(when(round(col("__cos"), 6) >= 0.8, 1)).as("eligible"))
        .crossJoin(foundAgg)
        .select(col("planted"), col("eligible"), col("found"), col("lsh_pairs"),
          graft.functions.Quantize.scaledFloor(
            col("found").cast("double") / col("eligible").cast("double"), 4).as("recall"))
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

    // URL extraction metrics (C4-family web-corpus stage). The corpus has
    // no URLs, so both engines PLANT them doc_id-derived: a per-mod-20
    // example.com URL for most docs (doc_id % 11 != 0 — the rest exercise
    // the empty-extraction path), plus a bad.net URL on every third doc.
    // Pure RE2-portable regexp expressions; sorted-distinct domains as csv.
    "q63_url_metrics" -> ((s, d) => {
      TextAnalysis.urlMetrics(plantUrls(Tables.documents(s, d)), "doc_id", "text")
        .select(col("doc_id"), col("n_urls"),
          array_join(col("domains"), ",").as("domains_csv"))
        .orderBy(col("doc_id"))
    }),

    // Domain-blocklist filtering over the same planted corpus: docs whose
    // URL domain is on the (broadcast) blocklist are dropped. blocked{0,1,2}
    // .bad.net are listed, blocked{3,4}.bad.net are not — survivors are the
    // non-planted docs plus bad-URL docs whose mod-5 variant is unlisted.
    "q64_domain_blocklist" -> ((s, d) => {
      import s.implicits._
      val blocklist = Seq("blocked0.bad.net", "blocked1.bad.net", "blocked2.bad.net")
        .toDF("domain")
      TextAnalysis.filterByDomainBlocklist(
        plantUrls(Tables.documents(s, d)), "doc_id", "text", blocklist)
        .orderBy(col("doc_id"))
    }),

    // Per-language corpus data card: doc counts, token totals, and the
    // corpus distinct-token ratio as a division of exact integer sums.
    "q67_corpus_stats" -> ((s, d) =>
      TextAnalysis.corpusStats(Tables.documents(s, d), "text")
        .orderBy(col("lang"))),

    // Edit-distance fuzzy verification over a deterministic candidate set
    // (consecutive doc ids — bounded, n pairs); texts truncated to 120
    // chars to cap the per-pair DP, mirrored exactly in the oracle.
    "q68_edit_distance" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cands = docs.select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      Dedup.editDistanceVerify(docs, "doc_id", "text", cands, truncateAt = 120)
        .orderBy(col("id_a"))
    }),

    // Bucketed range join: every 100th event defines a 1-hour interval;
    // all events landing inside any interval pair with it — expressed as
    // the bucket EQUI-join (+ residual filter), never a BNLJ over the
    // range predicate. Integer-micro timestamps in both engines.
    "q69_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val points = ev.select(col("event_id").as("point_id"), unix_micros(col("ts")).as("t"))
      val intervals = ev.filter(col("event_id") % 100 === 0)
        .select(col("event_id").as("interval_id"),
          unix_micros(col("ts")).as("ival_start"),
          (unix_micros(col("ts")) + lit(3600000000L)).as("ival_end"))
      RangeJoin.pointsInIntervals(points, "t", intervals, "ival_start", "ival_end",
        bucketWidth = 3600000000L)
        .select(col("interval_id"), col("point_id"))
        .orderBy(col("interval_id"), col("point_id"))
    }),

    // Interval-overlap join between two event-derived interval sets (2-hour
    // windows of every 50th event vs 1-hour windows of every 70th): bucket
    // equi-join + first-shared-bucket residual, exactly one row per
    // overlapping pair, no distinct pass, no BNLJ.
    "q70_interval_overlap" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def ivals(mod: Int, lenUs: Long, idName: String, sName: String, eName: String) =
        ev.filter(col("event_id") % mod === 0)
          .select(col("event_id").as(idName),
            unix_micros(col("ts")).as(sName),
            (unix_micros(col("ts")) + lit(lenUs)).as(eName))
      RangeJoin.intervalOverlaps(
        ivals(50, 7200000000L, "a_id", "a_start", "a_end"), "a_start", "a_end",
        ivals(70, 3600000000L, "b_id", "b_start", "b_end"), "b_start", "b_end",
        bucketWidth = 3600000000L)
        .select(col("a_id"), col("b_id"))
        .orderBy(col("a_id"), col("b_id"))
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

    // Per-group token budgets (the form mixtures are written in): German
    // gets a tight budget, everything else a loose default — same
    // hash-order walk as q73, different cut per stratum.
    "q82_token_budget_by_group" -> ((s, d) =>
      Sampling.tokenBudgetSampleByGroup(
        Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang")),
        "doc_id", "text", "lang",
        budgets = Seq("de" -> 800L), defaultBudget = 4000L, salt = "mix-v2")
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))),

    // ANN over the INT8-DEQUANTIZED vectors — the quantized-storage
    // retrieval path end-to-end under the oracle: quantize (q66's exact
    // arithmetic) → dequantize → brute-force cosine top-k (q26's shape).
    // Both engines replay quantize+dequantize with identical double
    // arithmetic, so even the ranking is oracle-exact.
    "q81_ann_quantized" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val deq = Similarity.quantizeInt8(e, "vec_id", "embedding")
        .select(col("vec_id"),
          Similarity.dequantize(col("qvec"), col("scale")).as("embedding"))
      Similarity.bruteForceTopK(
        vectors = deq, vectorId = "vec_id", vectorCol = "embedding",
        probes = deq.filter(col("vec_id") < 10), probeId = "vec_id", probeCol = "embedding",
        k = 5)
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // Time-series resample + forward fill: irregular per-user events onto
    // a daily grid, gaps carrying the last observed value — keyed shuffles
    // and per-key windows only, grid bounded by span/bucket.
    "q79_resample_ffill" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"))
      TimeSeries.resampleForwardFill(ev, "user_id", "t", "event_id",
        bucketWidth = 86400000000L)
        .orderBy(col("user_id"), col("bucket"))
    }),

    // Fact-fact join THROUGH the bucketed table layout: both sides
    // written bucketed on the join key, joined and aggregated off the
    // catalog tables — the zero-exchange co-location path under the value
    // oracle (the plan assertion lives in BucketedWriteSpec). Re-entrant:
    // overwrite-mode writes, so bench re-runs are safe.
    "q76_bucketed_join" -> ((s, d) => {
      import graft.sinks.BucketedWrite
      val ev = Tables.events(s, d).select(col("user_id"), col("event_id"))
      val ord = Tables.orders(s, d)
        .select(col("o_custkey").as("user_id"), col("o_orderkey"))
      BucketedWrite.writeBucketed(ev, "g76_events", numBuckets = 8, bucketCols = Seq("user_id"))
      BucketedWrite.writeBucketed(ord, "g76_orders", numBuckets = 8, bucketCols = Seq("user_id"))
      s.table("g76_events").join(s.table("g76_orders"), "user_id")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"), max(col("o_orderkey")).as("max_order"))
        .orderBy(col("user_id"))
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
      val dir = java.nio.file.Files.createTempDirectory("graft-q83-index")
        .resolve("store").toString
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
      IndexStore.read(s, dir)
        .withColumn("over_admitted", lit(preRows - rowsAfter).cast("long"))
        .orderBy(col("fp"))
    }),

    // Skew-proof per-key row cap (the "at most k docs per domain" gate):
    // salted two-phase top-k, never a hot-key row_number window; the
    // kept-pair join is SMJ-pinned. Oracle: the window formulation.
    "q71_cap_per_key" -> ((s, d) =>
      Skew.capPerKey(
        Tables.events(s, d).select(col("user_id"), col("event_id")),
        Seq("user_id"), "event_id", k = 3)
        .orderBy(col("user_id"), col("event_id"))),

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

    // Token-budget mixture cut per language: deterministic hash order,
    // two-phase distributed prefix sum (never one window task per group),
    // keep while the exclusive prefix is under budget. The oracle is the
    // single-window formulation of the same arithmetic.
    "q73_token_budget" -> ((s, d) =>
      Sampling.tokenBudgetSample(
        Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang")),
        "doc_id", "text", Seq("lang"), budgetTokens = 5000L, salt = "mix-v1")
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))),

    // Per-vector int8 quantization (embedding storage compression): the
    // max element maps to ±127 exactly; the oracle re-derives every
    // quantized element with identical double arithmetic. The array output
    // is exploded to one scalar row per element — the driver's compare
    // harness sorts/hashes pandas columns, and array-typed cells are
    // unhashable there (r6 q66 finding), so every oracle-gated entry must
    // emit scalar-only columns.
    "q66_quantize_int8" -> ((s, d) =>
      Similarity.quantizeInt8(
        Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding")
        .select(col("vec_id"), col("scale"), posexplode(col("qvec")))
        .select(col("vec_id"), col("pos"), col("col").as("q"), col("scale"))
        .orderBy(col("vec_id"), col("pos"))),

    // Heavy-hitter 3-grams (boilerplate mining): exact counts, top 50,
    // gram tiebreak — one map-side-combined count shuffle + TakeOrdered
    // (never a global sort).
    "q65_top_ngrams" -> ((s, d) =>
      TextAnalysis.topNgrams(Tables.documents(s, d), "text", n = 3, k = 50)),

    // SimHash near-dup. The token hash is an md5 prefix, so even this
    // signature scheme is oracle-checked: the oracle SQL rebuilds the
    // majority-vote signature per document from the same hash.
    "q32_dedup_simhash" -> ((s, d) => {
      Dedup.simHashNearDupPairs(Tables.documents(s, d), "doc_id", "text", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // LSH-bucketed ANN (approximate scale path). The sign-LSH planes are
    // deterministic, so even this "approximate" op is oracle-checked: the
    // oracle SQL reproduces the bucketing from the same plane constants.
    "q33_ann_lsh" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.lshTopK(
        vectors = e, vectorId = "vec_id", vectorCol = "embedding",
        probes = e.filter(col("vec_id") < 10), probeId = "vec_id", probeCol = "embedding",
        k = 5, dim = 64, nBits = 8)
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // TF-IDF: top-3 most characteristic terms per document.
    "q35_tfidf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      // N rides the plan as a broadcast scalar — no separate count() job
      val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
      TextAnalysis.tfidf(docs, "doc_id", "text")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"),
          round(col("tfidf"), 4).as("tfidf"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // Salted aggregation: the skew-proof two-phase plan must be value-equal
    // to the direct aggregation (the oracle aggregates directly).
    "q36_salted_agg" -> ((s, d) => {
      Skew.saltedSumCount(
        Tables.lineitem(s, d),
        keys = Seq(col("l_returnflag")),
        sumCols = Seq("sum_qty" -> col("l_quantity"), "sum_price" -> col("l_extendedprice")),
        saltSource = col("l_orderkey"),
        saltBuckets = 16)
        .select(col("l_returnflag"), col("cnt"), col("sum_qty"), col("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Typed UDAF (Aggregator) surface: price-weighted mean quantity; exact
    // decimal partials make the custom aggregate engine- and
    // partitioning-independent (oracle = plain SQL decimal aggregate).
    "q38_weighted_mean" -> ((s, d) => {
      val wm = graft.functions.WeightedMean.udaf
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(wm(col("l_quantity"), col("l_extendedprice")).as("wmean_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // Exact n-gram Jaccard pairs via the inverted shingle index (the direct,
    // non-LSH dedup family member) — must equal q25's LSH+verify output AND
    // the same all-pairs oracle.
    "q39_ngram_jaccard" -> ((s, d) => {
      Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("id_a"), col("id_b"))
    }),

    // IVF ANN (deterministic quantizer: centroids = vec_id < 16, nprobe = 4)
    // — approximate by construction yet fully oracle-checkable because cell
    // assignment and probe fan-out are deterministic.
    "q40_ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopK(
        vectors = e, vectorId = "vec_id", vectorCol = "embedding",
        centroids = e.filter(col("vec_id") < 16), centroidId = "vec_id", centroidCol = "embedding",
        probes = e.filter(col("vec_id") < 10), probeId = "vec_id", probeCol = "embedding",
        k = 5, nprobe = 4)
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // Multimodal binary plumbing under the oracle gate: text bytes as the
    // opaque media column, probed in the vectorized EXPRESSION form
    // (length/md5/hex stay inside WholeStageCodegen; the batch-shaped
    // mapPartitions sibling is value-identical and spec-pinned against it).
    "q41_multimodal_probe" -> ((s, d) => {
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        lit("text/plain").as("mime"),
        encode(col("text"), "UTF-8").as("content"),
        lit(null).cast("struct<width:int,height:int,duration_ms:bigint>").as("meta"))
      Multimodal.probeBytesExpr(media, headLen = 8)
        .orderBy(col("media_id"))
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
      // centerForBuckets: luminance features are single-orthant, the case
      // where raw sign-LSH buckets collapse; verification is unchanged so
      // the all-pairs oracle still holds row for row
      Similarity.cosineNearDupPairsLsh(feats, "vec_id", "embedding",
        threshold = 0.99, dim = 64, bandBits = 3, bands = 32,
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

    // BM25 retrieval: top-10 docs for three literal queries over the
    // corpus, scored via the bounded TopKScored aggregator (no window).
    // Scores round to 4 for cross-engine double comparability; the k=10
    // boundary gaps were measured at 1e-4+ on this corpus, far above
    // summation-order noise.
    "q87_bm25_topk" -> ((s, d) => {
      import s.implicits._
      val queries = Seq((1L, "batch join"), (2L, "customer query table"), (3L, "nosuchterm"))
        .toDF("query_id", "qtext")
      TextAnalysis.bm25TopK(Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", queries, "query_id", "qtext", k = 10)
        .select(col("query_id"), col("doc_id"), round(col("score"), 4).as("score"))
        .orderBy(col("query_id"), col("doc_id"))
    }),

    // Retrieval-quality evaluation over the BM25 ranking: recall@10 /
    // MRR@10 / nDCG@10 per query against graded qrels derived
    // deterministically in-plan (occurrences of the query's first term,
    // capped at 3). Ranks recomputed by the engine-independent
    // (score desc, id) rule on the scoreScale-quantized scores, so rank
    // order — and therefore every metric — is identical in any engine.
    // "nosuchterm" retrieves nothing and so has no output row (metrics
    // are per-RETRIEVED-query); a query with qrels but no relevant
    // retrieval would emit 0s.
    "q113_retrieval_eval" -> ((s, d) => {
      import s.implicits._
      val queries = Seq((1L, "batch join"), (2L, "customer query table"), (3L, "nosuchterm"))
        .toDF("query_id", "qtext")
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val ranked = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        queries, "query_id", "qtext", k = 10, scoreScale = 4)
      val firstTerm = queries.select(col("query_id"),
        split(col("qtext"), " ").getItem(0).as("__term"))
      val qrels = docs.crossJoin(firstTerm)
        .select(col("query_id"), col("doc_id"),
          least(size(filter(split(col("text"), " "), t => t === col("__term"))), lit(3)).as("rel"))
        .filter(col("rel") > 0)
      TextAnalysis.retrievalMetrics(ranked, "query_id", "doc_id", "score", qrels, "rel", k = 10)
        .select(col("query_id"),
          round(col("recall_at_k"), 6).as("recall_at_k"),
          round(col("mrr_at_k"), 6).as("mrr_at_k"),
          round(col("ndcg_at_k"), 6).as("ndcg_at_k"))
        .orderBy(col("query_id"))
    }),

    // Text normalization (the C4/CCNet prep step): lowercase -> accent
    // fold -> whitespace collapse as one pure codegen'd projection. Both
    // engines plant the same accented, multi-space prefix so the fold map
    // and the collapse are actually exercised (the synthetic corpus is
    // ASCII), and the oracle applies the SAME literal map.
    "q115_normalize" -> ((s, d) => {
      val planted = concat(
        lit("HÉLLO  WÖRLD ÀÉÎÕÜ façade œuvre\t"), col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.normalizeText(planted).as("norm"))
        .orderBy(col("doc_id"))
    }),

    // Naive-Bayes TRAINING of the hashed quality weights (the missing half
    // of q92's inference pass): label = (lang = 'en'), 64 buckets, add-1
    // smoothing. Every weight is ln of integer-count ratios — one keyed
    // integer aggregation plus a 64-row domain join; the oracle rebuilds
    // the counts and weights bucket for bucket.
    "q116_nb_train" -> ((s, d) => {
      TextAnalysis.trainNaiveBayesWeights(
        Tables.documents(s, d).select(col("text"), col("lang")),
        "text", col("lang") === "en", buckets = 64)
        .select(col("bucket"), col("cpos"), col("cneg"), round(col("weight"), 6).as("weight"))
        .orderBy(col("bucket"))
    }),

    // TRAINED-model quality scoring end to end: train NB weights on the
    // (lang = 'en') label, collect the parameter-sized model (rounded to 6
    // decimals — the quantization BOTH engines score with), and run q92's
    // inference pass with the ln-prior bias. Pins the trainer→scorer
    // contract (bucket hash, weight order, bias) in one oracle.
    "q117_nb_quality" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang"))
      val weights = TextAnalysis.collectNaiveBayesModel(
        TextAnalysis.trainNaiveBayesWeights(docs, "text", col("lang") === "en", buckets = 64),
        buckets = 64)
      val bias = TextAnalysis.naiveBayesPrior(docs, col("lang") === "en")
        .select(round(col("bias"), 6)).head().getDouble(0)
      TextAnalysis.hashedLinearScore(docs.select(col("doc_id"), col("text")),
        "doc_id", "text", weights, bias)
        .select(col("doc_id"), col("quality_score"))
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

    // Cluster-aware train/val/test split (split-leakage prevention): q43's
    // near-dup clusters drive split membership, so no near-dup pair ever
    // straddles train and eval. Membership hashes the CC cluster id with
    // the shared boundary literals; the oracle reruns the recursive-CTE CC
    // and the same hash thresholds.
    "q120_cluster_split" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = Dedup.jaccardPairs(docs, "doc_id", "text").select("id_a", "id_b")
      val clusters = Dedup.connectedComponents(
        docs.select(col("doc_id")), "doc_id", edges, "id_a", "id_b")
      Sampling.clusterAwareSplit(docs.select(col("doc_id")), "doc_id", clusters,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "csp")
        .orderBy(col("doc_id"))
    }),

    // T5/BART-style span corruption: deterministic hash-seeded span masks,
    // whole runs collapsed to one <MASK> in the input, masked spans joined
    // <SEP>-delimited into the target. Pure per-row projection; the oracle
    // replays the same hash/window/rebuild arithmetic.
    "q121_span_corruption" -> ((s, d) => {
      Chunking.spanCorruption(Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", startRate = 0.08, spanTokens = 3, salt = "sc1")
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

    // Tokenizer compression data card: train 2 BPE merges (q100's trainer),
    // then per-language doc/char/whitespace/subword totals and the
    // chars-per-token compression ratio — every ratio one division of two
    // exact integer sums.
    "q123_bpe_card" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Tokenizer.mergesOf(
        Tokenizer.trainBpe(docs.select(col("text")), "text", merges = 2))
      Tokenizer.compressionCard(docs.select(col("text"), col("lang")), "text", "lang", merges)
        .orderBy(col("lang"))
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

    // Deterministic bottom-k sample: the 100 smallest-hash docs — the
    // fixed-size mergeable corpus sample (TakeOrdered, never a full sort).
    "q125_bottomk_sample" -> ((s, d) => {
      Sampling.bottomKSample(Tables.documents(s, d).select(col("doc_id")),
        "doc_id", k = 100, salt = "bk1")
        .orderBy(col("doc_id"))
    }),

    // Table profile: the per-column data-quality card — row/null counts,
    // lexicographic min/max of the string form, and the register-exact HLL
    // distinct estimate (p=6), all keyed by column name through one
    // unpivot scan. The oracle rebuilds every HLL register per column.
    "q128_table_profile" -> ((s, d) => {
      Profiler.profileColumns(Tables.documents(s, d),
        Seq("doc_id", "lang", "source", "n_chars"), p = 6, salt = "prof9")
        .orderBy(col("column"))
    }),

    // Sample quantiles: nearest-rank quantiles of n_chars over the
    // deterministic 100-doc bottom-k sample — the O(k) quantile path, with
    // membership and estimates both engine-exact.
    "q126_sample_quantiles" -> ((s, d) => {
      Sampling.sampleQuantiles(Tables.documents(s, d), "doc_id", "n_chars",
        k = 100, quantiles = Seq(0.1, 0.5, 0.9, 0.99), salt = "bk1")
        .orderBy(col("quantile"))
    }),

    // Uniform k-per-group sample: 20 hash-drawn docs per language through
    // the bounded capPerKey aggregator (no hot-group window); the oracle is
    // the rank-over-hash window formulation.
    "q127_group_sample" -> ((s, d) => {
      Sampling.groupBottomKSample(Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id", Seq("lang"), k = 20, salt = "gs1")
        .orderBy(col("doc_id"))
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

    // Bigram LM self-perplexity (the CCNet statistical quality signal):
    // add-1-smoothed bigram model trained on the corpus scoring the corpus.
    "q95_bigram_ppl" -> ((s, d) => {
      TextAnalysis.bigramPerplexity(Tables.documents(s, d).select(col("doc_id"), col("text")),
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

    // Deterministic spherical k-means (the IVF/SemDeDup quantizer trainer):
    // 4 centroids, 2 Lloyd iterations, init = the 4 lowest vec_ids —
    // centroids exploded to scalar (cid, dim, value) rows for the oracle,
    // which unrolls the same two iterations in SQL.
    "q93_kmeans_train" -> ((s, d) => {
      val cents = Similarity.trainKMeans(Tables.embeddings(s, d),
        "vec_id", "embedding", k = 4, iterations = 2, dim = 64)
      cents.select(col("cid"), col("size"), posexplode(col("centroid")).as(Seq("dim", "cval")))
        .select(col("cid"), col("dim"), round(col("cval"), 4).as("cval"), col("size"))
        .orderBy(col("cid"), col("dim"))
    }),

    // Hybrid-retrieval fusion: RRF over two genuinely different BM25
    // rankings (length-normalized b=0.75 vs un-normalized b=0) of the same
    // literal queries — the BM25+dense-ANN combiner shape with both legs
    // oracle-expressible. Legs select on QUANTIZED scores (scoreScale=4):
    // the b=0 leg has exact theoretical ties (length-independent scores)
    // straddling the k=20 cut, so raw-score selection is summation-order
    // noise — quantize-then-tiebreak is the only engine-stable form (the
    // oracle ranks on round(score, 4) the same way).
    "q90_rrf_fusion" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val queries = Seq((1L, "batch join"), (2L, "customer query table"))
        .toDF("query_id", "qtext")
      val legA = TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, "query_id", "qtext",
        k = 20, scoreScale = 4)
      val legB = TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, "query_id", "qtext",
        k = 20, b = 0.0, scoreScale = 4)
      TextAnalysis.reciprocalRankFusion(Seq(legA, legB), "query_id", "doc_id", "score", k = 10)
        .select(col("query_id"), col("doc_id"), round(col("rrf_score"), 6).as("rrf_score"))
        .orderBy(col("query_id"), col("doc_id"))
    }),

    // Temperature-rebalanced sampling (group-share^alpha): flatten the
    // language mix at alpha = 0.5 while keeping ~30% of the corpus; all
    // rates in-plan, admission the shared 60-bit hash invariant.
    "q91_temperature_mix" -> ((s, d) => {
      Sampling.temperatureMixture(Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id", "lang", alpha = 0.5, targetFraction = 0.3, salt = "temp-v1")
        .orderBy(col("doc_id"))
    }),

    // Hashed-feature linear quality scorer with a shared literal weight
    // vector (the fasttext-filter inference pass, pure per-row).
    "q92_quality_score" -> ((s, d) => {
      TextAnalysis.hashedLinearScore(Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", qualityWeights, bias = -0.5)
        .select(col("doc_id"), col("quality_score"))
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

    // SemDeDup over the embeddings table: 8 deterministic centroids (the
    // 8 lowest vec_ids), nearest-centroid clustering, keep-first within a
    // cluster at cosine >= 0.3 (the corpus has no planted high-cosine
    // pairs, so the gate uses the same threshold the exact-pairs queries
    // exercise).
    "q88_semdedup" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val centroids = e.orderBy(col("vec_id")).limit(8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.semDedup(e, "vec_id", "embedding", centroids, "cid", "cvec", threshold = 0.3)
        .orderBy(col("vec_id"))
    }),

    // SemDeDup at production shape: the quantizer is TRAINED (q93's exact
    // 2-iteration k-means), not raw corpus vectors — pinning the
    // quantizer-consumer contract (cosine assignment, argmax ties to the
    // lowest cid) end-to-end through one oracle, which unrolls the same
    // two Lloyd iterations in SQL and feeds the resulting centroids to
    // q88's SemDeDup SQL.
    "q96_semdedup_trained" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = Similarity.trainKMeans(e, "vec_id", "embedding", k = 4, iterations = 2, dim = 64)
      Similarity.semDedup(e, "vec_id", "embedding", cents, "cid", "centroid", threshold = 0.3)
        .orderBy(col("vec_id"))
    }),

    // Hybrid retrieval proper: RRF over THREE legs — two BM25 variants
    // plus a DENSE leg (exact cosine top-20 for two embedding probes) —
    // the advertised BM25 + dense-ANN combiner with every leg
    // oracle-expressible. All legs select on quantized scores
    // (scoreScale = 4, the rank-stable form); measured: dense rank-20/21
    // gaps 1.3e-4+, boundary distances 2.8e-7+ on the gate corpus.
    "q97_rrf_dense" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val queries = Seq((1L, "batch join"), (2L, "customer query table"))
        .toDF("query_id", "qtext")
      val legA = TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, "query_id", "qtext",
        k = 20, scoreScale = 4)
      val legB = TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, "query_id", "qtext",
        k = 20, b = 0.0, scoreScale = 4)
      val emb = Tables.embeddings(s, d)
      val probes = emb.filter(col("vec_id").isin(1L, 2L))
        .select(col("vec_id").as("query_id"), col("embedding"))
      val legC = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          probes, "query_id", "embedding", k = 20, scoreScale = 4)
        .select(col("probe_id").as("query_id"), col("nbr_id").as("doc_id"),
          col("cos_sim").as("score"))
      TextAnalysis.reciprocalRankFusion(Seq(legA, legB, legC), "query_id", "doc_id", "score", k = 10)
        .select(col("query_id"), col("doc_id"), round(col("rrf_score"), 6).as("rrf_score"))
        .orderBy(col("query_id"), col("doc_id"))
    }),

    // HELD-OUT bigram perplexity — the CCNet deployment shape: the model
    // trains on the curated half (even doc_ids) and scores the incoming
    // half (odd doc_ids), exercising the unseen-bigram total-scoring path
    // (p = 1/V at worst) that self-scoring (q95) never hits.
    "q98_bigram_ppl_heldout" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      TextAnalysis.bigramPerplexity(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        trainOn = Some(docs.filter(col("doc_id") % 2 === 0)))
        .orderBy(col("doc_id"))
    }),

    // Deterministic farthest-point initialization (the k-means++
    // determinization): seed = lowest vec_id, then 3 argmin-of-max-cosine
    // selections, emitted with assignment sizes at iterations = 0 so the
    // oracle pins the SELECTION itself (measured winner margins 2e-2+ on
    // the gate corpus — far above cross-engine dot-product noise).
    "q99_kmeans_farthest" -> ((s, d) => {
      val cents = Similarity.trainKMeans(Tables.embeddings(s, d),
        "vec_id", "embedding", k = 4, iterations = 0, dim = 64, init = "farthest")
      cents.select(col("cid"), col("size"), posexplode(col("centroid")).as(Seq("dim", "cval")))
        .select(col("cid"), col("dim"), round(col("cval"), 4).as("cval"), col("size"))
        .orderBy(col("cid"), col("dim"))
    }),

    // Johnson–Lindenstrauss projection (dense Rademacher, 64 -> 16): every
    // projected component emitted and rounded — the full-matrix operator
    // check. Pure per-row, zero shuffle; the oracle re-derives each
    // component from the same plane constants embedded as SQL literals
    // (Double.toString round-trips; both engines dot left-to-right).
    "q106_jl_project" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.jlProject(emb, "embedding", "__jl", inDim = 64, outDim = 16)
        .select(col("vec_id"), posexplode(col("__jl")).as(Seq("d", "comp")))
        // + 0.0 canonicalizes IEEE signed zero (-0.0 -> +0.0) so the rounded
        // component hashes identically across engines (DuckDB's round keeps
        // the sign bit; a value-equal -0.0 vs +0.0 fails any byte hash).
        .select(col("vec_id"), col("d"), (round(col("comp"), 4) + lit(0.0)).as("comp"))
        .orderBy(col("vec_id"), col("d"))
    }),

    // JL-compressed ANN — the projection's payoff shape: project the corpus
    // AND the probes through the SPARSE Achlioptas matrix (64 -> 16, 2/3 of
    // multiplies vanish), then exact top-5 cosine in the 16-dim space.
    // Downstream of the projection every shuffled byte is 4x narrower; the
    // ranking selects on quantized scores (scoreScale = 4, the rank-stable
    // form; measured rank-5/6 gaps 1e-4+ on the gate corpus).
    "q107_jl_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val proj = Similarity.jlProject(emb, "embedding", "__jl",
        inDim = 64, outDim = 16, sparse = true)
      val probes = proj.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("__jl"))
      Similarity.bruteForceTopK(proj, "vec_id", "__jl",
          probes, "query_id", "__jl", k = 5, scoreScale = 4)
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // Distributed BPE tokenizer training (Sennrich et al.): 2 merge
    // iterations over the corpus word-frequency table — the only
    // corpus-scale pass is the word count; each merge is one vocab-sized
    // aggregation with a 1-row argmax collect. Pair counts are exact longs
    // (no float anywhere), ties break lexicographically, so the unrolled
    // SQL oracle reproduces the merges symbol for symbol.
    "q100_bpe_train" -> ((s, d) => {
      Tokenizer.trainBpe(Tables.documents(s, d).select(col("text")), "text", merges = 2)
        .orderBy(col("iter"))
    }),

    // BPE application end-to-end: train 2 merges, then tokenize the corpus
    // with them as a pure codegen'd projection (wrap symbols, fold the
    // merges as left-to-right replaces, count subwords) — the train→apply
    // contract in one oracle, exercising the same greedy non-overlapping
    // merge order in both engines.
    "q101_bpe_apply" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val merges = Tokenizer.mergesOf(
        Tokenizer.trainBpe(docs.select(col("text")), "text", merges = 2))
      docs.select(col("doc_id"),
          Tokenizer.bpeTokenCount(col("text"), merges).as("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    }),

    // The full Gopher quality-rule battery (Rae et al. 2021): word-count,
    // mean-word-length, symbol-ratio, bullet/ellipsis line fractions,
    // alpha-word fraction, stop-word presence, and the conjunction keep.
    // Line rules are exercised by planting deterministic bullet/ellipsis
    // blocks (every 7th doc gets a 20-line bullet tail — 20/22 lines
    // crosses the 0.9 gate; every 5th an ellipsis block); word-count and
    // stop-word rules vary naturally across the corpus. Pure per-row
    // projection — the single-scan gate shape.
    "q102_gopher_rules" -> ((s, d) => {
      val bullets20 = (1 to 20).map(i => s"- bullet $i").mkString("\n")
      val lined = Tables.documents(s, d).select(col("doc_id"), concat_ws("\n",
        col("text"),
        when(col("doc_id") % 7 === 0, lit(bullets20)).otherwise(lit("- item\n* item two")),
        when(col("doc_id") % 5 === 0, lit("to be continued...\nmore...\nyet more..."))
          .otherwise(lit("end."))).as("text"))
      TextAnalysis.gopherQualityFlags(lined, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // PageRank domain authority over the planted link graph (source ->
    // linked site domains, the q63/q64 URL construction as an edge list):
    // 2 damped iterations, dangling site domains receive but don't
    // forward. The oracle unrolls both iterations; ranks round to 6 (the
    // GraphSpec boundary test measures rounding margins on this corpus).
    "q103_pagerank" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val siteLinks = docs.filter(col("doc_id") % 11 =!= 0)
        .select(col("source").as("src"),
          concat(lit("site"), (col("doc_id") % 20).cast("string"),
            lit(".example.com")).as("dst"))
      val badLinks = docs.filter(col("doc_id") % 3 === 0)
        .select(col("source").as("src"),
          concat(lit("blocked"), (col("doc_id") % 5).cast("string"),
            lit(".bad.net")).as("dst"))
      graft.operators.Graph.pageRank(siteLinks.union(badLinks), "src", "dst", iterations = 2)
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("node"))
    }),

    // Personalized PageRank from two trusted seed sources (TrustRank):
    // proximity-to-seed scores over the same link graph — the
    // trusted-domain expansion primitive; teleport is a pure isin
    // expression over the literal seed list.
    "q191_ppr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val siteLinks = docs.filter(col("doc_id") % 11 =!= 0)
        .select(col("source").as("src"),
          concat(lit("site"), (col("doc_id") % 20).cast("string"),
            lit(".example.com")).as("dst"))
      val badLinks = docs.filter(col("doc_id") % 3 === 0)
        .select(col("source").as("src"),
          concat(lit("blocked"), (col("doc_id") % 5).cast("string"),
            lit(".bad.net")).as("dst"))
      graft.operators.Graph.personalizedPageRank(siteLinks.union(badLinks),
        "src", "dst", seeds = Seq("src0", "src1"), iterations = 2)
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("node"))
    }),

    // DSIR data selection (Xie et al. 2023): hashed bag-of-words
    // importance models trained in-plan (target = the English slice, raw
    // = the full corpus, 64 buckets), then the per-row log-ratio
    // inference pass with a keep gate at ratio > 0 (more target-like
    // than raw-like). The oracle rebuilds the bucket models and the
    // sequential token fold with the identical md5 feature hash.
    "q104_dsir_score" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang"))
      val ratios = Sampling.trainImportanceRatios(
        docs.filter(col("lang") === "en"), docs, "text", buckets = 64)
      Sampling.importanceScore(docs.select(col("doc_id"), col("text")),
        "doc_id", "text", ratios)
        .select(col("doc_id"), col("n_tokens"), col("dsir_logratio"),
          (col("dsir_logratio") > 0.0).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // DSIR selection proper — Gumbel-top-k importance resampling without
    // replacement (k = 100): noisy key = logratio − ln(−ln(u)) with u the
    // row's salted 60-bit content hash scaled into (0,1); selection on the
    // ROUNDED key (the q90 quantized-selection lesson), ties to lowest id.
    "q105_dsir_resample" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang"))
      val ratios = Sampling.trainImportanceRatios(
        docs.filter(col("lang") === "en"), docs, "text", buckets = 64)
      Sampling.resampleByImportance(docs.select(col("doc_id"), col("text")),
        "doc_id", "text", ratios, k = 100, salt = "dsir9")
        .select(col("doc_id"), col("dsir_logratio"), col("gumbel_key"))
        .orderBy(col("doc_id"))
    }),

    // KMV distinct-count sketch per source over 3-token shingles: ONE
    // bounded keyed aggregation (O(k) state at every stage) instead of
    // countDistinct's full shuffle of the distinct shingle set — the
    // cardinality primitive that survives a corpus-shaped domain. The
    // oracle rebuilds the sketch relationally (k smallest distinct md5
    // hashes per source) and applies the same (k-1)·2^60/h_k estimator,
    // so the ENTIRE sketch is verified, not just the estimate.
    "q108_kmv_distinct" -> ((s, d) => {
      val sh = Tables.documents(s, d)
        .select(col("source"), explode(Dedup.shingles(col("text"))).as("sh"))
      Sketches.kmvSketch(sh, Seq("source"), col("sh"), k = 128, salt = "kmv9")
        .select(col("source"), size(col("kmv")).as("sketch_size"),
          round(Sketches.kmvDistinct(col("kmv"), 128), 4).as("est_distinct"))
        .orderBy(col("source"))
    }),

    // KMV set algebra — overlap of the English vs German shingle sets
    // estimated from the two sketches ALONE (no join between the corpora):
    // the k smallest hashes of the union are recoverable from the per-side
    // sketches, Jaccard is the fraction present in both, intersection is
    // Jaccard x the union estimate. At 100 TB this is how crawl-vs-crawl
    // or corpus-vs-benchmark overlap is measured without co-shuffling
    // either side.
    "q109_kmv_overlap" -> ((s, d) => {
      val k = 128
      val docs = Tables.documents(s, d)
      def side(lang: String, out: String) = Sketches.kmvSketch(
        docs.filter(col("lang") === lang)
          .select(explode(Dedup.shingles(col("text"))).as("sh")),
        Seq.empty, col("sh"), k, salt = "ov9")
        .select(col("kmv").as(out))
      side("en", "ka").crossJoin(side("de", "kb"))
        .select(Sketches.kmvOverlap(col("ka"), col("kb"), k): _*)
        .select(round(col("jaccard_est"), 6).as("jaccard_est"),
          round(col("union_est"), 4).as("union_est"),
          round(col("inter_est"), 4).as("inter_est"))
    }),

    // HyperLogLog distinct orderkeys per returnflag (p=6, m=64 registers):
    // register state is 64 small ints per group no matter how many
    // distinct keys stream through. Ranks avoid floating log2 entirely
    // (length(bin(w)) is floor(log2 w)+1 in both engines) and the
    // harmonic-mean denominator sums as SCALED INTEGERS, so the oracle
    // reproduces every register and the estimate is one identical double
    // division in each engine. ~11k distinct per flag at the gate SF keeps
    // the estimate far above the 2.5m linear-counting boundary (the one
    // branch with a transcendental).
    "q110_hll_distinct" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_returnflag"), col("l_orderkey"))
      val regs = Sketches.hllRegisters(li, Seq("l_returnflag"), col("l_orderkey"), p = 6, salt = "hll9")
      Sketches.hllEstimate(regs, Seq("l_returnflag"), p = 6)
        .select(col("l_returnflag"), round(col("hll_est"), 4).as("hll_est"), col("zero_regs"))
        .orderBy(col("l_returnflag"))
    }),

    // Count-Min frequency sketch over shingle document-frequencies (d=4,
    // w=512): the sketch is a FIXED 2048-counter table built in one
    // explode(4) + keyed sum, merged across shards counter-wise; the
    // probe lookup is min over 4 broadcast-joined cells. Estimates are
    // pure integers (>= exact by construction), so the oracle is
    // hash-exact with zero float concerns. Probes = the top-8 shingles by
    // (exact df desc, shingle) — deterministic, computed in-plan.
    "q111_cms_freq" -> ((s, d) => {
      val d4 = 4; val w = 512
      val el = Tables.documents(s, d)
        .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("sh"))
        .select(col("sh"))
      val exact = el.groupBy("sh").agg(count(lit(1)).as("exact_cnt"))
      // build from the pre-aggregated (elem, count) frame — the weighted
      // path, spec-pinned identical to the raw build: the depth-fold
      // explodes one row per DISTINCT shingle instead of per occurrence
      val sketch = Sketches.cmsSketch(exact, col("sh"), d4, w, "cms9",
        weightCol = col("exact_cnt"))
      val probes = exact.orderBy(col("exact_cnt").desc, col("sh")).limit(8)
      Sketches.cmsLookup(sketch, probes.select("sh"), "sh", d4, w, "cms9")
        .join(probes, "sh")
        .select(col("sh"), col("exact_cnt"), col("cms_est"))
        .orderBy(col("sh"))
    }),

    // Bloom-filter history membership: the constant-memory endgame of the
    // incremental-dedup family (q75's anti-join, stripKnownWindows' set
    // probe). History = even-doc_id texts; the filter is <= m/32 (word,
    // bits) rows built by one bit_or aggregation; every probe LEFT-joins
    // that broadcast-sized table and tests its 3 positions. One-sided by
    // construction — might_contain=false is DEFINITELY new (no false
    // negatives, spec-pinned), true is history-or-false-positive at
    // (1-e^(-kn/m))^k. All integer bit arithmetic, 32-bit words so shifts
    // stay <= 31 — oracle rebuilds the bitmap verbatim.
    "q112_bloom_history" -> ((s, d) => {
      val m = 4096; val kh = 3
      val docs = Tables.documents(s, d)
      val history = docs.filter(col("doc_id") % 2 === 0)
      val bloom = Sketches.bloomSketch(history, col("text"), m, kh, "bl9")
      Sketches.bloomMightContain(
        bloom, docs.select(col("doc_id"), col("text")), "text", m, kh, "bl9")
        .select(col("doc_id"), col("might_contain"))
        .orderBy(col("doc_id"))
    }),

    // Batch sessionization through the native session_window operator (the
    // same operator the streaming surface uses): 3-hour inactivity gap.
    "q42_sessionize" -> ((s, d) => {
      graft.streaming.Streams.sessionAggregate(
        Tables.events(s, d), keyCol = "user_id", tsCol = "ts", valueCol = "value", gap = "3 hours")
        .orderBy(col("user_id"), col("session_start"))
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

    // Salted shuffle join on a 3-value (maximally hot) key: the skew-proof
    // two-phase join must be row-for-row equal to the plain join (the oracle
    // joins directly).
    "q45_salted_join" -> ((s, d) => {
      import s.implicits._
      val dim = Seq(("A", "returned"), ("N", "normal"), ("R", "refunded"))
        .toDF("l_returnflag", "flag_label")
      Skew.saltedEquiJoin(
        Tables.lineitem(s, d), dim,
        keys = Seq("l_returnflag"),
        saltSource = col("l_orderkey"),
        saltBuckets = 16)
        .groupBy(col("l_returnflag"), col("flag_label"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast("decimal(28,4)")).cast("double").as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Confluent wire-format serde end to end under the oracle gate:
    // documents -> framed avro binary (magic ‖ id ‖ body, per partition) ->
    // expression-level header checks -> avro decode back. The oracle is the
    // identity, so any framing offset error, schema-id corruption, or avro
    // field mix-up fails the hash compare.
    "q46_confluent_roundtrip" -> ((s, d) => {
      import graft.serde.{ConfluentAvroFrames, ConfluentWireColumns}
      val schemaJson =
        """{"type":"record","name":"Doc","namespace":"graft",
           |"fields":[{"name":"doc_id","type":"long"},{"name":"text","type":"string"}]}""".stripMargin
      val wire = ConfluentAvroFrames.serialize(
        Tables.documents(s, d), topic = "docs", isKey = false, schemaJson = schemaJson)
        .withColumn("schema_id", ConfluentWireColumns.wireSchemaId(col("wire")))
        .withColumn("magic_ok", ConfluentWireColumns.hasWireMagic(col("wire")))
      ConfluentAvroFrames.deserialize(
          wire, wireCol = "wire", topic = "docs", isKey = false, schemaJson = schemaJson)
        .select(col("doc_id"), col("text"), col("schema_id"), col("magic_ok"))
        .orderBy(col("doc_id"))
    }),

    // Schemaless JSON serde end to end under the oracle gate (the
    // reference's Circe/Jsoniter/ZIO-Json codec family): documents ->
    // one JSON object per row in a binary wire column -> an INDEPENDENT
    // json-path probe of the raw bytes (get_json_object exercises the
    // syntax without from_json) -> FAILFAST parse back to typed columns.
    // Identity oracle: any escaping error, field mix-up, or type coercion
    // slip fails the hash compare. Both directions are pure expressions —
    // the whole round trip stays inside whole-stage codegen.
    "q50_json_roundtrip" -> ((s, d) => {
      import graft.serde.JsonFrames
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val wire = JsonFrames.serialize(Tables.documents(s, d), Seq("doc_id", "text"))
        .withColumn("jpath_id",
          get_json_object(col("wire").cast("string"), "$.doc_id").cast("long"))
      JsonFrames.deserialize(wire, "wire",
          StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
        .select(col("doc_id"), col("text"), col("jpath_id"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic hash sampling: selection is a pure function of
    // (salt, doc_id) — layout/run/engine independent, which is the whole
    // point — so an independent engine computes the EXACT same subset.
    "q51_hash_sample" -> ((s, d) =>
      Sampling.deterministicSample(Tables.documents(s, d), "doc_id", rate = 0.2, salt = "s1")
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))),

    // Train/val/test assignment as a row invariant: every doc labeled from
    // cumulative hash ranges (80/10/10). The oracle re-derives the label
    // from the same md5 arithmetic — any boundary slip moves rows between
    // splits and fails the hash compare.
    "q52_hash_split" -> ((s, d) =>
      Sampling.hashSplit(Tables.documents(s, d), "doc_id",
          splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "sp")
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))),

    // Stratified (class-balance) sampling over the events stream: per-type
    // admission rates via a chained-when threshold — no join, no shuffle.
    "q53_stratified_sample" -> ((s, d) =>
      Sampling.stratifiedSample(Tables.events(s, d), "event_id", "event_type",
          rates = Seq("error" -> 0.05, "purchase" -> 1.0, "click" -> 0.25),
          defaultRate = 0.5, salt = "st")
        .select(col("event_id"), col("event_type"))
        .orderBy(col("event_id"))),

    // Weighted corpus mixing: two (here: synthetic halves of `documents`
    // playing two corpora) hash-sampled at different rates and unioned
    // under a source label — the training-mixture step. The oracle is the
    // same pair of threshold filters UNION ALL'd, so a wrong rate, salt
    // bleed between corpora, or label mix-up all fail the hash compare.
    "q54_mix_corpora" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val a = docs.filter(col("doc_id") % 2 === 0)
      val b = docs.filter(col("doc_id") % 2 === 1)
      Sampling.mixByRates(Seq((a, 0.5, "even"), (b, 0.25, "odd")), "doc_id", "mx")
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // Token-window chunking (training-sequence / RAG prep): 32-token
    // windows starting every 24 tokens (8 overlap), tail kept. The oracle
    // re-derives every window with DuckDB list functions — geometry drift
    // (off-by-one starts, lost tails, wrong overlap) changes the row set
    // or a chunk string and fails the hash compare.
    "q56_chunking" -> ((s, d) =>
      Chunking.chunkByTokens(Tables.documents(s, d), "doc_id", "text",
          chunkTokens = 32, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // PII redaction under the hash gate. The corpus is synthetic (no real
    // PII), so both engines PLANT identical doc_id-derived PII (an email,
    // an IP, a phone) into the text, then redact: placeholder tags and
    // audit counts must match byte-for-byte. Regexes are RE2-compatible so
    // both engines' automata agree on every match boundary.
    "q57_pii_redaction" -> ((s, d) =>
      TextAnalysis.redactPii(
        Tables.documents(s, d).withColumn("text",
          concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com at 10.0."),
            col("doc_id") % 256, lit(".7 or 555-"),
            format_string("%03d", col("doc_id") % 1000), lit("-1234"))),
        "doc_id", "text")
        .orderBy(col("doc_id"))),

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

    // Intra-document repetition (C4/Gopher boilerplate signal): fraction of
    // repeated 3-grams per doc. Pure per-row expressions — zero shuffles.
    "q59_repetition" -> ((s, d) =>
      TextAnalysis.repetitionMetrics(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Sequence packing over the q56 chunk geometry: token-boundary binning
    // into 512-token packs via the DISTRIBUTED prefix sum (16 order-aligned
    // buckets here; the oracle's single global cumsum must agree exactly —
    // bucketing moves work, never results).
    "q60_packing" -> ((s, d) =>
      Chunking.packSequences(
        Chunking.chunkByTokens(Tables.documents(s, d), "doc_id", "text",
            chunkTokens = 32, overlap = 8)
          .select(col("doc_id"), col("chunk_idx"), col("chunk_tokens")),
        "doc_id", "chunk_idx", "chunk_tokens", capacity = 512, buckets = 16)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // Exact interpolated percentiles per group — via distributed
    // value-count pre-aggregation. A bare percentile() funnels every
    // group's raw rows into ONE reduce task (its sort buffer holds the
    // group — the classic exact-percentile scale-killer); pre-aggregating
    // (group, value) counts is a map-side-combined shuffle that hands the
    // weighted percentile only the DISTINCT values per group. Bit-identical
    // result (percentile's frequency form interpolates the same ranks).
    "q37_percentile" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      def weighted(valueCol: String, aggs: (String, Double)*) = {
        val cols = aggs.map { case (name, p) =>
          round(expr(s"percentile($valueCol, $p, __f)"), 4).as(name)
        }
        base
          .groupBy(col("l_returnflag"), col(valueCol))
          .agg(count(lit(1)).as("__f"))
          .groupBy(col("l_returnflag"))
          .agg(cols.head, cols.tail: _*)
      }
      weighted("l_quantity", "p50_qty" -> 0.5, "p90_qty" -> 0.9)
        .join(weighted("l_extendedprice", "p50_price" -> 0.5), Seq("l_returnflag"))
        .orderBy(col("l_returnflag"))
    }),

    // Product-quantization codebook training (Jégou et al.): 4 subspaces ×
    // 4 codes over the 64-dim embeddings, one Lloyd iteration from the
    // lowest-id init — the deterministic trainer contract (assignment on
    // 1e-6-quantized squared-L2, ties to the lowest code) unrolled in the
    // oracle the same way q93 unrolls k-means.
    "q131_pq_train" -> ((s, d) => {
      Similarity.pqTrain(Tables.embeddings(s, d), "vec_id", "embedding",
        m = 4, ksub = 4, dim = 64, iterations = 1)
        .select(col("subspace"), col("code"), posexplode(col("centroid")).as(Seq("dim", "cval")))
        .select(col("subspace"), col("code"), col("dim"), round(col("cval"), 4).as("cval"))
        .orderBy(col("subspace"), col("code"), col("dim"))
    }),

    // PQ encode + asymmetric-distance retrieval end to end: the corpus
    // stored as 4 codes/vector, probes scoring through the m·ksub lookup
    // table — selection on round(score, 4) with lowest-id ties (the
    // scoreScale contract), so the ADC ranking is engine-independent.
    "q132_pq_adc" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val books = Similarity.pqTrain(e, "vec_id", "embedding",
        m = 4, ksub = 4, dim = 64, iterations = 1)
      val codes = Similarity.pqEncode(e, "vec_id", "embedding", books, m = 4, dim = 64)
      Similarity.pqTopK(codes, "vec_id", "codes", books,
        probes = e.filter(col("vec_id") < 5), probeId = "vec_id", probeCol = "embedding",
        k = 5, m = 4, dim = 64, scoreScale = 4)
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // Rolling 7-day distinct users from per-day HLL registers merged by
    // the max rule — rolling MAU without rescanning events; the oracle
    // rebuilds every window's registers from scratch (q110's rules over
    // the windowed event set), so merge-of-sketches == sketch-of-union
    // is what the hash compare actually checks.
    "q167_rolling_mau" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(unix_date(to_date(col("ts"))).cast("long").as("day"), col("user_id"))
      val regs = Sketches.hllRegisters(ev, Seq("day"), col("user_id"), p = 6, salt = "rmau")
      Sketches.hllRollingEstimate(regs, "day", p = 6, windowPeriods = 7)
        .select(col("day"), round(col("hll_est"), 4).as("hll_est"), col("zero_regs"))
        .orderBy(col("day"))
    }),

    // LSH sizing diagnostic: per-band bucket occupancy + predicted
    // candidate-pair volume at bandBits=4/bands=8 — the measurement the
    // documented bandBits sizing rule reads; oracle regenerates every
    // bucket from the published plane literals.
    "q166_lsh_occupancy" -> ((s, d) => {
      Similarity.lshOccupancyReport(Tables.embeddings(s, d), "vec_id", "embedding",
        dim = 64, bandBits = 4, bands = 8)
        .orderBy(col("band"))
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

    // Template mining: every 13th doc opens with a planted 8-token
    // boilerplate header; the prefix counter surfaces exactly it (organic
    // 8-token prefixes are all unique at minCount 5).
    "q164_template_mining" -> ((s, d) => {
      val header = "SYSTEM NOTICE all rights reserved template header text"
      val planted = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(lit(s"$header "), col("text")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.templatePrefixes(planted, "text", prefixTokens = 8, minCount = 5)
        .orderBy(col("prefix"))
    }),

    // Embedding-space drift: cosine between the mean vectors of the even
    // and odd embedding halves (same space, so the alarm stays silent:
    // cos ~ 1 on this corpus).
    "q165_embedding_drift" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.embeddingDrift(
        e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1),
        "embedding", dim = 64)
    }),

    // Jelinek-Mercer interpolated bigram perplexity, trained on the even
    // half and scoring the odd half: unseen histories fall back to the
    // smoothed unigram term (the ML guard path), lambda = 0.7.
    "q162_interpolated_ppl" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.bigramPerplexityInterpolated(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        lambda = 0.7, k = 1.0,
        trainOn = Some(docs.filter(col("doc_id") % 2 === 0)))
        .orderBy(col("doc_id"))
    }),

    // Functional-dependency audit: which sources map to >1 language —
    // constraint mining over one distinct + one count aggregation.
    "q158_fd_check" -> ((s, d) => {
      Profiler.fdViolations(Tables.documents(s, d), Seq("source"), Seq("lang"))
        .orderBy(col("source"))
    }),

    // Column-entropy card over the enum columns: concentration in nats,
    // exact counts under the fold, ln rounds at 6.
    "q159_entropy_card" -> ((s, d) => {
      Profiler.entropyCard(Tables.documents(s, d), Seq("lang", "source"))
        .orderBy(col("column"))
    }),

    // Referential-integrity audit with planted orphans: suppliers with
    // s_suppkey % 7 == 0 removed from the dimension, so exactly their
    // lineitems surface as FK orphans through the SMJ anti-join.
    "q160_ri_check" -> ((s, d) => {
      Profiler.riOrphans(
        Tables.lineitem(s, d), "l_suppkey",
        Tables.supplier(s, d).filter(col("s_suppkey") % 7 =!= 0), "s_suppkey")
        .orderBy(col("l_suppkey"))
    }),

    // User-journey paths: each user's first 5 event types in order,
    // counted across users — the behavioral fingerprint report.
    "q161_journeys" -> ((s, d) => {
      graft.operators.Funnel.journeyPaths(Tables.events(s, d),
        "user_id", Seq("ts", "event_id"), "event_type", maxSteps = 5)
        .orderBy(col("path"))
    }),

    // Snapshot diff: a simulated prior vintage (every 7th doc missing ->
    // inserts, every 5th's text staled -> updates, planted extra rows ->
    // deletes) diffed against the current table into a minimal I/U/D
    // changeset via ONE SMJ-pinned full-outer join.
    "q156_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang"))
      val oldDf = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, lit("stale text")).otherwise(col("text")).as("text"),
          col("lang"))
        .unionByName(docs.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text"), col("lang")))
      graft.operators.Snapshot.diffSnapshots(oldDf, docs, Seq("doc_id"))
        .orderBy(col("op"), col("doc_id"))
    }),

    // The round-trip law as the gate: applying the q156 changeset onto
    // the old vintage must reproduce the current table EXACTLY — the
    // oracle is a plain SELECT of documents.
    "q157_snapshot_apply" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang"))
      val oldDf = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, lit("stale text")).otherwise(col("text")).as("text"),
          col("lang"))
        .unionByName(docs.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text"), col("lang")))
      val changes = graft.operators.Snapshot.diffSnapshots(oldDf, docs, Seq("doc_id"))
      graft.operators.Snapshot.applyChangeset(oldDf, changes, Seq("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // Cross-CORPUS ANN pair mining: even vs odd embeddings through the
    // banded sign-LSH equi-join (never a cross join), exact verification;
    // q48's recall-1 band shape on this corpus, so the output equals the
    // exact cross-pair oracle.
    "q155_cross_ann" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.crossCosinePairsLsh(
        e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
        threshold = 0.3, dim = 64, bandBits = 3, bands = 32)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Cross-source quantile normalization: each doc's n_chars percentile
    // WITHIN its source (0-based row_number rank / (n-1), doc_id ties) —
    // the score-calibration step before mixing scored corpora; ranks via
    // the two-phase grouped rank, never one window task per source.
    "q154_quantile_norm" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
      val ranked = Skew.groupedRank(docs, Seq("source"), "n_chars", "doc_id")
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("__n"))
      ranked.join(broadcast(counts), Seq("source"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          when(col("__n") > 1,
            round(col("rank").cast("double") / (col("__n") - 1).cast("double"), 6))
            .otherwise(lit(0.0)).as("pct"))
        .orderBy(col("doc_id"))
    }),

    // Declarative expectation suite: five named aggregate checks (one
    // deliberately failing) evaluated in a single-row aggregation and
    // unpivoted to (check, passed) — the pre-consumption vintage gate.
    "q152_expectations" -> ((s, d) => {
      Profiler.expect(Tables.documents(s, d), Seq(
        "row_count_at_least_100" -> (count(lit(1)) >= 100),
        "no_null_text" -> (sum(when(col("text").isNull, 1L).otherwise(0L)) === 0),
        "n_chars_positive" -> (min(col("n_chars")) > 0),
        "langs_at_most_10" -> (countDistinct(col("lang")) <= 10),
        "always_fails" -> (count(lit(1)) < 0)))
        .orderBy(col("check"))
    }),

    // Vintage drift: total-variation distance between the even- and
    // odd-doc n_chars distributions over the shared q144 bin domain —
    // exact integer-count ratios, one number out.
    "q153_histogram_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Profiler.histogramDrift(
        docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1),
        "n_chars", minV = 0L, maxV = 4095L, bins = 16)
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

    // Per-node triangle count + clustering coefficient over a synthetic
    // doc-derived link graph (same-id-space modular edges, so triangles
    // exist — q136's source→site graph is bipartite and has none).
    // Degree-ordered compact-forward: three SMJ self-joins, wedge volume
    // O(m^1.5)-bounded — the community-density / link-farm signal.
    "q169_triangles" -> ((s, d) => {
      val edges = Tables.documents(s, d).select(
        (col("doc_id") % 100).as("src"), ((col("doc_id") * 31 + 7) % 100).as("dst"))
      graft.operators.Graph.triangles(edges, "src", "dst")
        .orderBy(col("node"))
    }),

    // PMI collocation mining: top-50 adjacent word pairs by pointwise
    // mutual information (min count 5) — multiword-unit / stock-phrase
    // extraction; count tables stay vocabulary-shaped, SMJ-joined.
    "q170_pmi_collocations" -> ((s, d) => {
      TextAnalysis.pmiCollocations(Tables.documents(s, d), "text", minCount = 5, k = 50)
        .orderBy(col("pmi").desc, col("pair"))
    }),

    // χ² distinctive-keyword card per language: top-5 terms per lang by
    // the 2x2 occurrence contingency statistic (min in-group count 20) —
    // integer counts to the last ratio, double arithmetic mirrored in the
    // oracle term for term.
    "q171_chi2_keywords" -> ((s, d) => {
      TextAnalysis.chiSquaredKeywords(Tables.documents(s, d), "lang", "text",
        minCount = 20, k = 5)
        .orderBy(col("grp"), col("rnk"))
    }),

    // Per-source KL divergence from the corpus unigram mixture (observed
    // terms exact, corpus side add-one smoothed) — the vocabulary-drift
    // card; nothing dense, vocab-shaped joins only.
    "q172_kl_divergence" -> ((s, d) => {
      TextAnalysis.klFromCorpus(Tables.documents(s, d), "source", "text")
        .orderBy(col("slice"))
    }),

    // Character-class script profile + mojibake flag per doc (planted
    // damage: every 53rd doc gets a replacement char, every 67th a
    // UTF-8-as-Latin-1 digraph) — pure per-row projections, zero shuffle.
    "q173_script_mix" -> ((s, d) => {
      val planted = Tables.documents(s, d).select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 53 === 0, lit(" damaged \ufffd here")).otherwise(lit("")),
        when(col("doc_id") % 67 === 0, lit(" caf\u00c3\u00a9")).otherwise(lit(""))).as("text"))
      TextAnalysis.scriptProfile(planted, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Mergeable histogram quantiles: two shard histograms (even/odd docs)
    // merged by count addition == from-scratch, then p50/p90/p99 of
    // n_chars per lang by in-bin interpolation — the metrics-store
    // approximate-quantile path with a parameter-visible error bound.
    "q174_hist_quantiles" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val shards = Seq(docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
        .map(g => Profiler.histogram(g, "n_chars", Seq("lang"), minV = 0L, maxV = 1023L, bins = 64))
      val merged = shards.reduce(_ unionByName _)
        .groupBy(col("lang"), col("bin")).agg(sum(col("cnt")).as("cnt"))
      Profiler.histogramQuantiles(merged, Seq("lang"), minV = 0L, maxV = 1023L, bins = 64,
        quantiles = Seq(0.5, 0.9, 0.99))
        .orderBy(col("lang"), col("q"))
    }),

    // Epoch-aware corpus mixing with fractional epochs per language
    // (de ×2.5, en ×0.5, es ×1.0, fr ×1.25, zh ×2.0): ⌊e⌋ full copies per
    // doc + a salted-hash coin for the fractional epoch — deterministic,
    // zero-shuffle, each copy tagged with its epoch index.
    "q175_epoch_mix" -> ((s, d) => {
      Sampling.epochMix(Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "doc_id", "lang",
        Seq("de" -> 2.5, "en" -> 0.5, "es" -> 1.0, "fr" -> 1.25, "zh" -> 2.0), salt = "em1")
        .orderBy(col("doc_id"), col("epoch"))
    }),

    // N-gram novelty of the odd-doc batch vs the even-doc reference: the
    // marginal-value score incremental corpus building ranks on —
    // membership via one SMJ anti-join against the corpus-shaped
    // reference gram set.
    "q176_ngram_novelty" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.ngramNovelty(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        docs.filter(col("doc_id") % 2 === 0), "text", n = 3)
        .orderBy(col("doc_id"))
    }),

    // Median (interpolated, the engine-shared percentile definition) +
    // DETERMINISTIC mode (max count, ties to the smallest value — argmax
    // as a max-struct, no window) per return flag.
    "q177_median_mode" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val med = li.groupBy(col("l_returnflag"))
        .agg(median(col("l_quantity")).as("med_qty"))
      val counts = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("__c"))
      val mode = counts.groupBy(col("l_returnflag"))
        .agg(max(struct(col("__c").as("c"), (-col("l_quantity")).as("nq"))).as("__m"))
        .select(col("l_returnflag"), (-col("__m.nq")).as("mode_qty"),
          col("__m.c").as("mode_cnt"))
      med.join(mode, "l_returnflag").orderBy(col("l_returnflag"))
    }),

    // Grouped winsorization: n_chars clipped to each lang's [p05, p95]
    // band — robust scaling per stratum; enum-sized bounds broadcast, pure
    // clamp projection.
    "q178_winsorize" -> ((s, d) => {
      Skew.winsorizeByGroup(
        Tables.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
        Seq("lang"), "n_chars", lo = 0.05, hi = 0.95)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("winsorized"))
        .orderBy(col("doc_id"))
    }),

    // Bounded degree peeling toward the 11-core (2 rounds) over a
    // two-residue doc graph — dense-subgraph extraction; each round is a
    // keyed degree count + two semi-joins, oracle unrolled round by round.
    "q179_degree_peel" -> ((s, d) => {
      val edges = Tables.documents(s, d).select(
        (col("doc_id") % 80).as("src"),
        ((col("doc_id") / 80).cast("long") * 7 + col("doc_id") * 13 + 5).mod(80).as("dst"))
      graft.operators.Graph.degreePeel(edges, "src", "dst", k = 11, iterations = 2)
        .orderBy(col("node"))
    }),

    // Ranking-function battery: ntile quartiles + percent_rank + cume_dist
    // per order status (unique tie-break on orderkey so every rank is
    // engine-deterministic) — the distribution-position window family.
    "q180_rank_battery" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("o_orderkey"))
    }),

    // Lexical-diversity card per language: TTR, hapax fraction, Simpson
    // repeat-probability — integer counts to the last ratio.
    "q181_lexical_diversity" -> ((s, d) => {
      TextAnalysis.lexicalDiversity(Tables.documents(s, d), "lang", "text")
        .orderBy(col("grp"))
    }),

    // Last-touch attribution: each purchase attributed to the user's most
    // recent click within a 7-day lookback — the as-of join composed with
    // an event-type split; click ties at one timestamp resolve to the max
    // click id (the q22 dedup-first discipline).
    "q182_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("click_ts"))
        .agg(max(col("event_id")).as("click_id"))
      val joined = AsofJoin.leftAsof(purchases, clicks,
        leftKeys = Seq("user_id"), rightKeys = Seq("user_id"),
        leftTime = "ts", rightTime = "click_ts",
        rightCols = Seq("click_id", "click_ts"))
      val lagUs = unix_micros(col("ts")) - unix_micros(col("click_ts"))
      val within = col("click_id").isNotNull && lagUs <= lit(7L * 86400L * 1000000L)
      joined.select(col("event_id"), col("user_id"),
        when(within, col("click_id")).as("attributed_click"),
        when(within, lagUs).as("lag_us"))
        .orderBy(col("event_id"))
    }),

    // Per-key EWMA (α = 0.25, exactly binary so 1−α is too): the
    // order-recursive statistic the secondary-sort fold exists for — both
    // engines fold the same doubles serially per key, so the oracle's
    // recursive CTE reproduces every smoothed value bitwise.
    "q183_ewma" -> ((s, d) => {
      TimeSeries.ewmaByKey(
        Tables.events(s, d).select(col("user_id"), col("ts"), col("event_id"), col("value")),
        "user_id", Seq("ts", "event_id"), "value", alpha = 0.25)
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // Two-sided CUSUM mean-shift monitor (target 50, slack 10,
    // threshold 200): accumulated-evidence change detection — the
    // sustained-small-shift complement to q146's rolling z-score.
    "q184_cusum" -> ((s, d) => {
      TimeSeries.cusumByKey(
        Tables.events(s, d).select(col("user_id"), col("ts"), col("event_id"), col("value")),
        "user_id", Seq("ts", "event_id"), "value",
        target = 50.0, slack = 10.0, threshold = 200.0)
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    }),

    // MAD robust outlier scoring per event type: median/MAD don't move
    // under the wild values a stddev z-score lets mask themselves.
    "q185_mad_outliers" -> ((s, d) => {
      Skew.madOutliers(
        Tables.events(s, d).select(col("event_id"), col("event_type"), col("value")),
        Seq("event_type"), "value", threshold = 3.5)
        .orderBy(col("event_id"))
    }),

    // Benford first-digit audit of order totals — the fabricated-data /
    // unit-mixup detector; floor-to-integer first (cast rounding differs
    // across engines), leading digit from the decimal form.
    "q186_benford" -> ((s, d) => {
      Profiler.benfordDigits(Tables.orders(s, d), "o_totalprice")
        .orderBy(col("digit"))
    }),

    // 10%-trimmed mean of n_chars per lang over the integer column —
    // integer sums keep the statistic shard-order-exact.
    "q187_trimmed_mean" -> ((s, d) => {
      Skew.trimmedMean(Tables.documents(s, d).select(col("lang"), col("n_chars")),
        Seq("lang"), "n_chars", frac = 0.1)
        .orderBy(col("lang"))
    }),

    // Funnel step-lag quantiles: p25/p50/p75 of the view→click and
    // click→purchase conversion delays — order statistics over integer
    // microsecond lags are exact doubles, no quantization needed.
    "q188_funnel_lags" -> ((s, d) => {
      val times = graft.operators.Funnel.funnelTimes(
        Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts")),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      val lags = times.select(explode(array(
        struct(lit("click>purchase").as("transition"),
          when(col("t3").isNotNull, unix_micros(col("t3")) - unix_micros(col("t2")))
            .as("lag_us")),
        struct(lit("view>click").as("transition"),
          when(col("t2").isNotNull, unix_micros(col("t2")) - unix_micros(col("t1")))
            .as("lag_us")))).as("__e"))
        .select(col("__e.*")).filter(col("lag_us").isNotNull)
      lags.groupBy(col("transition"))
        .agg(count(lit(1)).as("n_users"),
          expr("percentile(lag_us, 0.25)").as("p25"),
          expr("percentile(lag_us, 0.5)").as("p50"),
          expr("percentile(lag_us, 0.75)").as("p75"))
        .orderBy(col("transition"))
    }),

    // Flesch-style readability proxy (vowel-group syllables, terminal-
    // punctuation sentences) — the reading-level quality-card half.
    "q189_readability" -> ((s, d) => {
      TextAnalysis.readability(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Trigram lang-id with a CONFIDENCE MARGIN (best vs runner-up integer
    // distance): the abstain/route signal a multilingual pipeline
    // thresholds on — q137's classifier, one extra ranked window.
    "q199_langid_margin" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val profiles = TextAnalysis.trainTrigramProfiles(
        docs.filter(col("doc_id") % 2 === 0), "lang", "text", topN = 20)
      TextAnalysis.classifyByTrigramProfilesWithMargin(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", profiles, topN = 20)
        .orderBy(col("doc_id"))
    }),

    // Sequence-gap audit: contiguous runs of MISSING ids (planted: every
    // 97th event dropped) as (gap_start, gap_end, missing) rows — the
    // ingestion-completeness card (did the extractor skip a range?).
    "q200_id_gaps" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ids = Tables.events(s, d).filter(col("event_id") % 97 =!= 0)
        .select(col("event_id"))
      val w = Window.orderBy(col("event_id"))
      ids
        .withColumn("__prev", lag(col("event_id"), 1).over(w))
        .filter(col("__prev").isNotNull && col("event_id") - col("__prev") > 1)
        .select((col("__prev") + 1).as("gap_start"),
          (col("event_id") - 1).as("gap_end"),
          (col("event_id") - col("__prev") - 1).as("missing"))
        .orderBy(col("gap_start"))
    }),

    // ROLLUP with grouping_id: the aggregation-level indicator downstream
    // pivot/report consumers key on — completes the grouping-sets surface
    // (q10-q12) with the bitmask column itself.
    "q201_grouping_id" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("decimal(28,4)")).cast("double").as("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    }),

    // Composed link-authority curation gate: PPR-to-trusted-seeds (q191's
    // signal), co-citation clustering coefficient (q169's), and k-core
    // membership (q179's) COMBINED into one per-domain quality score, then
    // joined onto the document frame as the keep/drop gate — the way
    // production link-spam curation uses the graph signals together. The
    // link graph is two-tier by construction (8 wide generalist sources +
    // 12 narrow ones + blocked-domain hubs) so every signal has spread:
    // clustering 0.815..1.0, a proper-subset 25-core (38 of 45 domains),
    // PPR reaching 28 of 45. Oracle re-derives all three legs and the
    // composition; keep = score >= 0.004 (splits the measured bimodal
    // score distribution at its gap).
    "q202_link_authority_gate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = docs.filter(col("doc_id") % 11 =!= 0)
        .select(col("source").as("src"),
          concat(lit("site"),
            (((col("doc_id") / 20).cast("long") %
                when(col("doc_id") % 20 < 8, 25).otherwise(3)
              + (col("doc_id") % 20) * 2) % 40).cast("string"),
            lit(".example.com")).as("dst"))
        .unionByName(docs.filter(col("doc_id") % 9 === 0)
          .select(col("source").as("src"),
            concat(lit("blocked"), (col("doc_id") % 5).cast("string"),
              lit(".bad.net")).as("dst")))
      val authority = graft.operators.Graph.linkAuthority(edges, "src", "dst",
        seeds = Seq("src0", "src1"), pprIterations = 2, coreK = 25, coreIterations = 2)
      docs.select(col("doc_id"),
          concat(lit("site"), (col("doc_id") % 40).cast("string"),
            lit(".example.com")).as("domain"))
        .join(authority.hint("shuffle_merge"), Seq("domain"), "left")
        .select(col("doc_id"), col("domain"),
          coalesce(col("score"), lit(0.0)).as("score"),
          coalesce(col("in_core"), lit(false)).as("in_core"),
          (coalesce(col("score"), lit(0.0)) >= 0.004).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // Score-calibration card over the q92 hashed-linear quality scorer:
    // 10 score buckets, per bucket the count, integer-grid mean score,
    // observed en-rate, and the |gap| (the ECE contribution) — the
    // reliability diagram a quality gate ships with.
    "q203_reliability_card" -> ((s, d) => {
      val scored = TextAnalysis.hashedLinearScore(
        Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang")),
        "doc_id", "text", qualityWeights, bias = -0.5)
      Profiler.reliabilityCard(
        scored.withColumn("label", col("lang") === "en"),
        "quality_score", "label", bins = 10)
        .orderBy(col("bin"))
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

    // Rank-biased overlap of two retrieval runs per probe: exact cosine
    // ranking on the RAW vectors vs the same ranking on the INT8-
    // quantized/dequantized vectors (q81's storage-compression path) at
    // p=0.9, depth 10 — the top-weighted rank-agreement measure of what
    // quantization costs, per probe; per-pair weights ride a generated
    // 1e-9 integer grid.
    "q205_rbo" -> ((s, d) => {
      val dot = graft.functions.VectorExpressions.dot _
      def run(vecs: DataFrame) = {
        val e = vecs.select(col("vec_id"), col("__v"))
        val probes = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("__v").as("__p"))
        e.select(col("vec_id").as("nbr_id"), col("__v"))
          .crossJoin(broadcast(probes))
          .filter(col("nbr_id") =!= col("probe_id"))
          .select(col("probe_id"), col("nbr_id"),
            (dot(col("__p"), col("__v")) /
              (sqrt(dot(col("__p"), col("__p"))) * sqrt(dot(col("__v"), col("__v")))))
              .as("score"))
      }
      val raw = Tables.embeddings(s, d)
        .select(col("vec_id"), graft.operators.Similarity.asDouble(col("embedding")).as("__v"))
      val deq = graft.operators.Similarity
        .quantizeInt8(Tables.embeddings(s, d), "vec_id", "embedding")
        .select(col("vec_id"),
          graft.operators.Similarity.dequantize(col("qvec"), col("scale")).as("__v"))
      TextAnalysis.rankBiasedOverlap(run(raw), run(deq), "probe_id", "nbr_id", "score",
        p = 0.9, depth = 10)
        .orderBy(col("probe_id"))
    }),

    // MMR diversity re-ranking (λ=0.7, k=5) of the corpus against probe
    // vector 0's relevance — the RAG context-window re-ranker; greedy
    // k-step selection with quantized scores and lowest-id ties, each
    // step one argmax (the trainKMeans farthest-point collect class).
    "q206_mmr" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), graft.operators.Similarity.asDouble(col("embedding")).as("__v"))
      val dot = graft.functions.VectorExpressions.dot _
      val probe = e.filter(col("vec_id") === 0)
        .select(col("__v").as("__p"))
      val cands = e.filter(col("vec_id") > 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id"), col("__v").as("embedding"),
          (dot(col("__p"), col("__v")) /
            (sqrt(dot(col("__p"), col("__p"))) * sqrt(dot(col("__v"), col("__v")))))
            .as("rel"))
      graft.operators.Similarity.mmrRerank(cands, "vec_id", "embedding", "rel",
        k = 5, lambda = 0.7)
        .orderBy(col("rank"))
    }),

    // Per-group embedding-centroid outliers (integer-grid centroids, so
    // the flag is engine-exact): rows whose cosine to their own group's
    // centroid falls below 0.2 — the semantic mislabel/garbage filter.
    "q207_centroid_outliers" -> ((s, d) => {
      graft.operators.Similarity.centroidOutliers(
        Tables.embeddings(s, d).withColumn("grp", pmod(col("vec_id"), lit(4)).cast("string")),
        "vec_id", "grp", "embedding", dim = 64, minCos = 0.2)
        .orderBy(col("vec_id"))
    }),

    // Cohen's kappa per source slice: the q28 heuristic lang-id as rater A
    // vs the recorded lang metadata as rater B — chance-corrected labeler
    // agreement, integer counts to the last ratio.
    "q208_cohen_kappa" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = TextAnalysis.tokens(col("text"))
      graft.operators.Profiler.cohenKappa(
        docs.select(col("source").as("slice"),
          TextAnalysis.detectedLanguage(toks).as("detected"), col("lang")),
        "detected", "lang", groupCols = Seq("slice"))
        .orderBy(col("slice"))
    }),

    // Profile drift between two vintages: even docs are yesterday's
    // snapshot (doc_id, lang, n_chars), odd docs today's (doc_id, lang,
    // source — n_chars dropped, source added, every 13th lang nulled) —
    // the data-contract diff with added/removed/common statuses, the
    // null-rate spike, and the HLL cardinality ratio.
    "q209_profile_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val oldV = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val newV = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, lit(null).cast("string"))
            .otherwise(col("lang")).as("lang"),
          col("source"))
      graft.operators.Profiler.profileDrift(oldV, newV,
        Seq("doc_id", "lang", "n_chars"), Seq("doc_id", "lang", "source"),
        p = 6, salt = "pd9")
        .orderBy(col("column"))
    }),

    // RM3 pseudo-relevance-feedback expansion over q87's queries: top-10
    // BM25 feedback docs per query (the quantized-rank contract),
    // score-weighted relevance model on integer grids, top-8 feedback
    // terms interpolated at alpha = 0.5 with the original query model —
    // the expanded weighted query of a two-pass retrieval stack.
    "q210_rm3_expansion" -> ((s, d) => {
      import s.implicits._
      val queries = Seq((1L, "batch join"), (2L, "customer query table"), (3L, "nosuchterm"))
        .toDF("query_id", "qtext")
      TextAnalysis.rm3Expansion(Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", queries, "query_id", "qtext",
        fbDocs = 10, fbTerms = 8, origWeight = 0.5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Time-decayed event counts per type (half-life 7 days, anchored at
    // the corpus's max event time): the trending score — recency-weighted
    // volume on the 1e-9 integer grid.
    "q211_decayed_counts" -> ((s, d) => {
      TimeSeries.decayedCounts(Tables.events(s, d), "event_type", "ts",
        halfLifeSecs = 7.0 * 86400.0)
        .orderBy(col("event_type"))
    }),

    // Jaro-Winkler name matching (the native graft_jaro_winkler
    // expression) over deterministically corrupted customer names:
    // last-two-char swap / leading-char replacement / unchanged — the
    // name-entry corruption classes JW exists for; match gate at the
    // quantized 0.99.
    "q212_jaro_winkler" -> ((s, d) => {
      val variant = when(col("c_custkey") % 3 === 0,
          concat(expr("substring(c_name, 1, length(c_name) - 2)"),
            expr("substring(c_name, length(c_name), 1)"),
            expr("substring(c_name, length(c_name) - 1, 1)")))
        .when(col("c_custkey") % 3 === 1,
          concat(lit("K"), expr("substring(c_name, 2, length(c_name) - 1)")))
        .otherwise(col("c_name"))
      Tables.customer(s, d).select(col("c_custkey"), col("c_name"), variant.as("variant"))
        .withColumn("sim", graft.functions.Quantize.scaledFloor(
          graft.functions.JaroWinkler.similarity(col("c_name"), col("variant")), 6))
        .withColumn("is_match", col("sim") >= 0.99)
        .select(col("c_custkey"), col("variant"), col("sim"), col("is_match"))
        .orderBy(col("c_custkey"))
    }),

    // Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    // 100 documents sampled proportional to n_chars via u^(1/w) keys on
    // the salted hash grid — the quality-weighted subset primitive.
    "q213_weighted_sample" -> ((s, d) => {
      Sampling.weightedSample(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 100, salt = "ws1")
        .orderBy(col("es_key").desc, col("doc_id"))
    }),

    // Population Stability Index between vintages: even docs vs odd docs
    // with n_chars DOUBLED (planted major drift) on a 32-bin grid —
    // the scorecard drift gate, add-one smoothed, integer-grid summed.
    "q214_psi" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Profiler.psi(
        docs.filter(col("doc_id") % 2 === 0).select(col("n_chars")),
        docs.filter(col("doc_id") % 2 =!= 0).select((col("n_chars") * 2).as("n_chars")),
        "n_chars", minV = 0L, maxV = 2047L, bins = 32)
    }),

    // Mann-Whitney rank-sum drift significance: even docs vs odd docs
    // with n_chars shifted +50 — midranks with tie correction, exact
    // half-integer rank sums, normal-approximation z.
    "q215_mann_whitney" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Profiler.mannWhitney(
        docs.filter(col("doc_id") % 2 === 0).select(col("n_chars")),
        docs.filter(col("doc_id") % 2 =!= 0).select((col("n_chars") + 50L).as("n_chars")),
        "n_chars")
    }),

    // Gini concentration of documents over languages — the corpus-
    // dominance card (en carries ~44% of this corpus; a uniform grouping
    // scores exactly 0).
    "q216_gini" -> ((s, d) => {
      graft.operators.Profiler.giniConcentration(Tables.documents(s, d), "lang")
    }),

    // Two-sample KS test: even docs vs odd docs with n_chars DOUBLED — a
    // scale (shape) change PSI bins coarsely and Mann-Whitney reads only
    // as location; KS bounds the exact worst-case ECDF gap, integer
    // cross-products to the last division.
    "q217_ks_test" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Profiler.ksTest(
        docs.filter(col("doc_id") % 2 === 0).select(col("n_chars")),
        docs.filter(col("doc_id") % 2 =!= 0).select((col("n_chars") * 2).as("n_chars")),
        "n_chars")
    }),

    // Deterministic synchronous label propagation over a planted
    // 10-block community graph (intra-block edges from the doc-id digit
    // grid + sparse %127 bridges): 3 rounds, min-label ties — the
    // spam-ring / topical-cluster detector beyond plain connectivity.
    "q218_label_prop" -> ((s, d) => {
      val a = col("doc_id") % 1000
      val base = Tables.documents(s, d).select(a.as("a"))
      val intra = base.select(
        ((col("a") % 10) * 10 + expr("a DIV 10 % 10")).as("src"),
        ((col("a") % 10) * 10 + expr("a DIV 100 % 10")).as("dst"))
      val bridges = base.filter(col("a") % 127 === 0)
        .select((col("a") % 100).as("src"), ((col("a") + 13) % 100).as("dst"))
      graft.operators.Graph.labelPropagation(
        intra.union(bridges), "src", "dst", iterations = 3)
        .orderBy(col("node"))
    }),

    // Theil-Sen robust daily-volume trend per event type: median of
    // pairwise slopes over the per-day count series — one spiky day
    // can't drag it the way it drags OLS; slopes ranked on the integer
    // grid, the two middle values averaged exactly.
    "q219_theil_sen" -> ((s, d) => {
      val daily = Tables.events(s, d).filter(col("ts").isNotNull)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.TimeSeries.theilSen(daily, "event_type", "day", "cnt")
        .orderBy(col("event_type"))
    }),

    // Seasonal hour-of-day baseline vs actuals: pre-2024-01-04 events
    // build the expected hourly rate per event type, the rest compare
    // against it — per-day rates over unequal windows, exact-integer
    // ratio, new-slot and out-of-band flags.
    "q220_seasonal_baseline" -> ((s, d) => {
      graft.operators.TimeSeries.seasonalBaseline(
        Tables.events(s, d).select(col("event_type"), col("ts")),
        "event_type", "ts", lit("2024-01-04").cast("timestamp"))
        .orderBy(col("event_type"), col("hour"))
    }),

    // Krippendorff's alpha over a three-rater missing-data annotation
    // matrix (recorded lang; the q208 stopword heuristic; a third rater
    // who skips every 3rd doc and mislabels every 7th as 'en') — the
    // reliability statistic kappa can't express, via the coincidence
    // identity with NO pairwise join.
    "q221_krippendorff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = TextAnalysis.tokens(col("text"))
      val ra = docs.select(col("doc_id").as("unit"), lit("a").as("rater"),
        col("lang").as("value"))
      val rb = docs.select(col("doc_id").as("unit"), lit("b").as("rater"),
        TextAnalysis.detectedLanguage(toks).as("value"))
      val rc = docs.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id").as("unit"), lit("c").as("rater"),
          when(col("doc_id") % 7 === 0, lit("en")).otherwise(col("lang")).as("value"))
      graft.operators.Profiler.krippendorffAlpha(
        ra.union(rb).union(rc), "unit", "rater", "value")
    }),

    // Exact ROC AUC of "length predicts English" via the rank-sum
    // identity — no threshold sweep, ties handled by midranks; the
    // model-evaluation card alongside calibration (q203) and lift (q198).
    "q222_auc" -> ((s, d) => {
      graft.operators.Profiler.rocAuc(
        Tables.documents(s, d).select(col("n_chars"), (col("lang") === "en").as("is_en")),
        "n_chars", "is_en")
    }),

    // Mutual information / NMI / Cramér's V between lang and source —
    // does the sharding column leak the label? Three dependence views of
    // one contingency table, integer counts to the last grid sum.
    "q223_mutual_info" -> ((s, d) => {
      graft.operators.Profiler.mutualInformation(Tables.documents(s, d), "lang", "source")
    }),

    // Autocorrelation of daily event volume per type at lags 1..7 — the
    // seasonality card telling q220 which period to baseline on; exact
    // decimal sufficient statistics per (type, lag).
    "q224_acf" -> ((s, d) => {
      val daily = Tables.events(s, d).filter(col("ts").isNotNull)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.TimeSeries.autocorrelation(daily, "event_type", "day", "cnt",
        maxLag = 7)
        .orderBy(col("event_type"), col("lag"))
    }),

    // Poisson-bootstrap 95% CI for mean document length: 200 hash-seeded
    // replicates in one map-side pass — distribution-free error bars on
    // a skewed corpus statistic.
    "q225_bootstrap_ci" -> ((s, d) => {
      graft.operators.Profiler.bootstrapMeanCi(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", reps = 200, level = 0.95, salt = "bci")
    }),

    // Behavioral motif mining: every contiguous 3-gram of a user's
    // time-ordered event types, counted corpus-wide (min count 5) —
    // journeys fingerprint the opening, n-grams find recurring motifs
    // anywhere in the stream.
    "q226_event_ngrams" -> ((s, d) => {
      graft.operators.Funnel.eventNgrams(Tables.events(s, d),
        "user_id", Seq("ts", "event_id"), "event_type", n = 3, minCount = 5)
    }),

    // Kaplan-Meier time-to-first-purchase inside a 3-day analysis window:
    // users with no purchase by window end are CENSORED at it (~1 in 4 at
    // this window width) — survival with censoring handled honestly.
    "q227_kaplan_meier" -> ((s, d) => {
      val winEnd = lit("2024-01-03").cast("date")
      val ev = Tables.events(s, d).filter(to_date(col("ts")) <= winEnd)
      val first = ev.groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("start"))
      val firstBuy = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("pd"))
      val subj = first.join(firstBuy.hint("shuffle_merge"), Seq("user_id"), "left")
        .select(
          when(col("pd").isNotNull, datediff(col("pd"), col("start")))
            .otherwise(datediff(winEnd, col("start"))).as("duration"),
          col("pd").isNotNull.as("observed"))
      graft.operators.TimeSeries.kaplanMeier(subj, "duration", "observed")
        .orderBy(col("duration"))
    }),

    // Modularity of the q218 label-propagation partition on its own
    // graph — the partition-quality score; exact integer edge/degree
    // masses to the final two divisions.
    "q228_modularity" -> ((s, d) => {
      val a = col("doc_id") % 1000
      val base = Tables.documents(s, d).select(a.as("a"))
      val intra = base.select(
        ((col("a") % 10) * 10 + expr("a DIV 10 % 10")).as("src"),
        ((col("a") % 10) * 10 + expr("a DIV 100 % 10")).as("dst"))
      val bridges = base.filter(col("a") % 127 === 0)
        .select((col("a") % 100).as("src"), ((col("a") + 13) % 100).as("dst"))
      val edges = intra.union(bridges)
      val labels = graft.operators.Graph.labelPropagation(edges, "src", "dst",
        iterations = 3)
      graft.operators.Graph.modularity(edges, "src", "dst", labels, "node", "label")
    }),

    // Two-pass heavy hitters over the token stream: Misra-Gries O(k)
    // candidates + exact recount, phi = 1/200 — the dominance report
    // without a corpus-wide distinct-token shuffle.
    "q229_heavy_hitters" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      graft.operators.Profiler.heavyHitters(toks, "tok", phiDen = 200)
    }),

    // A/B readout with the SRM guard: users hash-assigned 50/50, per-arm
    // purchase conversion, pooled two-proportion z, and the
    // sample-ratio-mismatch z every experiment page must check FIRST.
    "q230_ab_readout" -> ((s, d) => {
      val users = Tables.events(s, d).groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"))
      graft.operators.Experiment.abReadout(users, "user_id", "converted", salt = "exp1")
    }),

    // RFM segmentation: per-user recency/frequency/monetary (synthetic
    // integral purchase amounts) scored 1-5 against corpus quintile
    // thresholds — the churn-model feature frame.
    "q231_rfm" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"),
        when(col("event_type") === "purchase", col("event_id") % 50 + 1)
          .otherwise(lit(0L)).as("amount"))
      graft.operators.Funnel.rfm(ev, "user_id", "ts", "amount")
        .orderBy(col("user_id"))
    }),

    // Metrics-store reconciliation: lineitem quantity rollup vs a
    // recompute with planted corruption (every 1000th order loses line 1;
    // every 500th gets +1) — exact decimal sums, empty result certifies,
    // missing_b and mismatch classes both exercised.
    "q232_reconcile" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val store = li.select(col("l_orderkey"), col("l_quantity"))
      val recompute = li
        .filter(!(col("l_orderkey") % 1000 === 0 && col("l_linenumber") === 1))
        .select(col("l_orderkey"),
          when(col("l_orderkey") % 500 === 0 && col("l_linenumber") === 1,
            col("l_quantity") + 1).otherwise(col("l_quantity")).as("l_quantity"))
      graft.operators.Profiler.reconcile(store, "l_orderkey", "l_quantity",
        recompute, "l_orderkey", "l_quantity")
        .orderBy(col("key"))
    }),

    // CUPED variance reduction: per-user pre-period (before Jan 16)
    // activity as the covariate for post-period activity — theta and the
    // achieved rho^2 reduction from exact decimal sufficient statistics.
    "q233_cuped" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cutoff = lit("2024-01-16").cast("date")
      val pre = ev.filter(to_date(col("ts")) < cutoff)
        .groupBy(col("user_id")).agg(count(lit(1)).as("pre"))
      val post = ev.filter(to_date(col("ts")) >= cutoff)
        .groupBy(col("user_id")).agg(count(lit(1)).as("post"))
      val users = pre.join(post.hint("shuffle_merge"), Seq("user_id"), "full_outer")
        .select(coalesce(col("pre"), lit(0L)).as("pre"),
          coalesce(col("post"), lit(0L)).as("post"))
      graft.operators.Experiment.cuped(users, "pre", "post")
    }),

    // k-anonymity / l-diversity audit of the customer frame under
    // (nation, segment) quasi-identifiers with acctbal sensitive — the
    // structural-privacy gate next to the free-text PII scrub.
    "q234_privacy_audit" -> ((s, d) => {
      graft.operators.Profiler.kAnonymityAudit(Tables.customer(s, d),
        Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 5, l = 3)
    }),

    // Deterministic permutation test: per-user engagement counts under
    // the q230 assignment, 200 hash-seeded pseudo-re-assignments — the
    // distribution-free p-value for a skewed metric, zero RNG.
    "q235_permutation_test" -> ((s, d) => {
      val users = Tables.events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("engagement"))
      val assigned = Sampling.hashSplit(users, "user_id",
        Seq("a" -> 0.5, "b" -> 0.5), "exp1")
      graft.operators.Experiment.permutationTest(assigned, "user_id", "split",
        "engagement", reps = 200, salt = "perm1")
    }),

    // Spearman rank correlation per return flag — Pearson on doubled
    // average ranks (exact integers), the monotone-association read
    // robust to the price magnitudes that drag q195's r.
    "q236_spearman" -> ((s, d) => {
      graft.operators.Inference.spearmanByGroup(
        Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice")),
        Seq("l_returnflag"), "l_quantity", "l_extendedprice")
        .orderBy(col("l_returnflag"))
    }),

    // Welch's unequal-variance t on per-user engagement between the
    // q230/q235 hash-assigned arms — the parametric companion to the
    // q235 permutation read, same assignment grid.
    "q237_welch_ttest" -> ((s, d) => {
      val users = Tables.events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("engagement"))
      val assigned = Sampling.hashSplit(users, "user_id",
        Seq("a" -> 0.5, "b" -> 0.5), "exp1")
      graft.operators.Inference.welchTTest(assigned, "split", "engagement", "a", "b")
    }),

    // One-way ANOVA F: does mean event value differ across event types —
    // the k-sample gate before slicing per-type.
    "q238_anova" -> ((s, d) => {
      graft.operators.Inference.anovaOneWay(
        Tables.events(s, d).select(col("event_type"), col("value")),
        "event_type", "value")
    }),

    // Kendall tau-b per event type on a capPerKey-bounded sample — the
    // exact pair join is quadratic BY CONTRACT, so the cap is the scale
    // story (exact tau on a deterministic per-group sample).
    "q239_kendall_tau" -> ((s, d) => {
      val e = Tables.events(s, d)
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .select(col("event_type"), col("event_id"), col("value"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("day"))
      val capped = Skew.capPerKey(e, Seq("event_type"), "event_id", 150)
      graft.operators.Inference.kendallTauB(capped, Seq("event_type"),
        "event_id", "value", "day")
        .orderBy(col("event_type"))
    }),

    // Ratio-of-sums jackknife: value-per-event by event type over user
    // units — the correct SE for a ratio metric (per-unit means are
    // wrong when units carry unequal denominators).
    "q240_ratio_jackknife" -> ((s, d) => {
      val units = Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .as("value_sum"),
          count(lit(1)).as("n_events"))
      graft.operators.Inference.ratioJackknife(units, Seq("event_type"),
        "value_sum", "n_events")
        .orderBy(col("event_type"))
    }),

    // Adamic–Adar link prediction on the q169 synthetic domain graph —
    // top-20 highest-evidence missing links.
    "q241_adamic_adar" -> ((s, d) => {
      val edges = Tables.documents(s, d).select(
        (col("doc_id") % 100).as("src"), ((col("doc_id") * 31 + 7) % 100).as("dst"))
      graft.operators.Graph.adamicAdar(edges, "src", "dst",
        maxDegree = 1024, topK = 20)
    }),

    // Exact binary-segmentation change point on the daily series — the
    // offline break localizer behind q184's online CUSUM flag.
    "q242_changepoint" -> ((s, d) => {
      val daily = Tables.events(s, d).filter(col("ts").isNotNull)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.TimeSeries.changepoint(daily, Seq("event_type"), "day", "cnt")
        .orderBy(col("event_type"))
    }),

    // Classical additive decomposition of the daily series (period 7):
    // trend / seasonal / remainder — the split q220 baselines against.
    "q243_stl" -> ((s, d) => {
      val daily = Tables.events(s, d).filter(col("ts").isNotNull)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.TimeSeries.stlDecompose(daily, Seq("event_type"), "day", "cnt")
        .orderBy(col("event_type"), col("day"))
    }),

    // Imbalanced-class training weights over document languages —
    // inverse-frequency + effective-number-of-samples, one aggregation.
    "q244_class_weights" -> ((s, d) => {
      Sampling.classWeights(Tables.documents(s, d), "lang")
        .orderBy(col("class"))
    }),

    // Stratified nearest-score matched-pairs ATT: purchase's effect on
    // total value, matching on engagement within user cohorts — the
    // observational companion to the randomized q230/q237 reads.
    "q245_matched_att" -> ((s, d) => {
      val users = Tables.events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("engagement"),
          sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
            .as("total_value"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("treated"))
        .withColumn("cohort", pmod(col("user_id"), lit(4L)))
      graft.operators.Experiment.matchedOutcomes(users, Seq("cohort"), "user_id",
        "treated", "engagement", "total_value", caliper = 5.0)
        .orderBy(col("cohort"))
    }),

    // Raking (IPF) to uniform lang x source target marginals — the survey
    // corpus-reweighting standard, 3 unrolled iterations.
    "q246_raking" -> ((s, d) => {
      Sampling.rakeWeights(Tables.documents(s, d), "lang", "source",
        Seq("de", "en", "es", "fr", "zh").map(_ -> 0.2),
        (0 until 20).map(i => s"src$i" -> 0.05),
        iterations = 3)
        .orderBy(col("lang"), col("source"))
    }),

    // Heaps'-law vocabulary-growth fit over id-range checkpoints.
    "q247_heaps_law" -> ((s, d) =>
      TextAnalysis.heapsLaw(Tables.documents(s, d), "doc_id", "text", buckets = 10)),

    // The composed experiment page: SRM-guarded conversion readout
    // (q230) + Welch engagement t (q237) + permutation p (q235) in ONE
    // row — the three reads an experimenter checks together, one scan
    // family, three 1-row frames crossJoined.
    "q248_experiment_scorecard" -> ((s, d) => {
      val users = Tables.events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("engagement"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"))
      val assigned = Sampling.hashSplit(users, "user_id",
        Seq("a" -> 0.5, "b" -> 0.5), "exp1")
      val ab = graft.operators.Experiment.abReadout(users, "user_id", "converted",
        salt = "exp1")
        .select(col("n_a"), col("n_b"), col("rate_a"), col("rate_b"),
          col("lift"), col("z_conv"), col("z_srm"), col("srm_flag"))
      val welch = graft.operators.Inference.welchTTest(assigned, "split",
        "engagement", "a", "b")
        .select(col("mean_a").as("mean_eng_a"), col("mean_b").as("mean_eng_b"),
          col("t_stat").as("welch_t"), col("df_welch"))
      val perm = graft.operators.Experiment.permutationTest(assigned, "user_id",
        "split", "engagement", reps = 200, salt = "perm1")
        .select(col("p_value").as("perm_p"))
      ab.crossJoin(broadcast(welch)).crossJoin(broadcast(perm))
    }),

    // Simplified silhouette of q93's trained centroids — the clustering
    // quality card, scored against the 1e-4-quantized model (the only
    // grid the float training means agree on across engines).
    "q249_silhouette" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = Similarity.trainKMeans(e, "vec_id", "embedding",
        k = 4, iterations = 2, dim = 64)
      Similarity.simplifiedSilhouette(e, "vec_id", "embedding",
        cents, "cid", "centroid")
        .orderBy(col("cid"))
    }),

    // Mann–Kendall monotone-trend test on the daily series — theilSen's
    // slope (q219) gets its significance gate.
    "q250_mann_kendall" -> ((s, d) => {
      val daily = Tables.events(s, d).filter(col("ts").isNotNull)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.Inference.mannKendall(daily, Seq("event_type"), "day", "cnt")
        .orderBy(col("event_type"))
    }),

    // Quantile treatment effect: per-arm engagement quantiles from the
    // MERGEABLE histogram path (q174's machinery grouped by arm) —
    // "where in the distribution did the experiment move", the read a
    // mean-only scorecard (q248) can't give.
    "q252_qte" -> ((s, d) => {
      val users = Tables.events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("engagement"))
      val assigned = Sampling.hashSplit(users, "user_id",
        Seq("a" -> 0.5, "b" -> 0.5), "exp1")
      val hist = Profiler.histogram(assigned, "engagement", Seq("split"),
        minV = 0L, maxV = 1023L, bins = 256)
      val qs = Profiler.histogramQuantiles(hist, Seq("split"),
        minV = 0L, maxV = 1023L, bins = 256, quantiles = Seq(0.5, 0.9, 0.99))
        .localCheckpoint(true) // 6 rows, referenced by both arm legs
      val a = qs.filter(col("split") === "a").select(col("q"), col("est").as("est_a"))
      val b = qs.filter(col("split") === "b").select(col("q"), col("est").as("est_b"))
      a.join(b, Seq("q"))
        .select(col("q"), col("est_a"), col("est_b"),
          graft.functions.Quantize.scaledFloor(col("est_b") - col("est_a"), 6)
            .as("qte"))
        .orderBy(col("q"))
    }),

    // Log-rank test on time-to-first-purchase between the hash-assigned
    // arms — "did the experiment move time-to-convert", the significance
    // gate on top of q227's Kaplan-Meier curve.
    "q253_log_rank" -> ((s, d) => {
      val winEnd = lit("2024-01-03").cast("date")
      val ev = Tables.events(s, d).filter(to_date(col("ts")) <= winEnd)
      val first = ev.groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("start"))
      val firstBuy = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("pd"))
      val subj = first.join(firstBuy.hint("shuffle_merge"), Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("pd").isNotNull, datediff(col("pd"), col("start")))
            .otherwise(datediff(winEnd, col("start"))).as("duration"),
          col("pd").isNotNull.as("observed"))
      val armed = Sampling.hashSplit(subj, "user_id",
        Seq("a" -> 0.5, "b" -> 0.5), "exp1")
      graft.operators.TimeSeries.logRank(armed, "split", "duration", "observed",
        "a", "b")
    }),

    // Sparse TF-IDF cosine pairs: the lexical similarity join (shared
    // RARE terms weigh; maxDf caps the per-term quadratic BY CONTRACT).
    "q254_tfidf_cosine" -> ((s, d) => {
      TextAnalysis.tfidfCosinePairs(Tables.documents(s, d), "doc_id", "text",
        maxDf = 50, threshold = 0.3, topK = 50)
    }),

    // Murphy decomposition of the Brier score for the q203 quality
    // scorer — the one-row calibration verdict.
    "q255_brier" -> ((s, d) => {
      val scored = TextAnalysis.hashedLinearScore(
        Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang")),
        "doc_id", "text", qualityWeights, bias = -0.5)
      Profiler.brierDecomposition(
        scored.withColumn("label", col("lang") === "en"),
        "quality_score", "label", bins = 10)
    }),

    // The calibration loop CLOSED: raw Brier (q255) vs Brier after
    // applying q256's isotonic map — calibrated Brier computes per-BIN in
    // closed form (within a bin p_cal is constant, so Σ(p−y)² =
    // n·iso² − 2·iso·pos + pos exactly), no second corpus pass. In-sample
    // by construction (the honest caveat a one-dataset demo carries).
    "q257_calibrated_brier" -> ((s, d) => {
      val scored = TextAnalysis.hashedLinearScore(
        Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang")),
        "doc_id", "text", qualityWeights, bias = -0.5)
        .select(col("quality_score"), (col("lang") === "en").as("label"))
        .localCheckpoint(true) // the md5 projection feeds THREE legs
      val raw = Profiler.brierDecomposition(scored, "quality_score", "label", 10)
        .select(col("n"), col("brier").as("brier_raw"),
          col("reliability").as("reliability_raw"))
      val iso = Profiler.isotonicCalibration(scored, "quality_score", "label", 10)
        .select(col("bin"), col("iso"))
      val binExpr = least(greatest(
        floor(col("quality_score").cast("double") * 10).cast("long"), lit(0L)), lit(9L))
      val binstats = scored
        .select(binExpr.as("bin"), col("label").cast("long").as("__y"))
        .groupBy(col("bin")).agg(count(lit(1)).as("__n"), sum(col("__y")).as("__pos"))
      val q9 = (c: org.apache.spark.sql.Column) =>
        graft.functions.Quantize.scaledFloor(c, 9)
      val cal = binstats.join(broadcast(iso), Seq("bin"))
        .select(col("__n"),
          q9(col("__n").cast("double") * col("iso") * col("iso")
            - lit(2.0) * col("iso") * col("__pos").cast("double")
            + col("__pos").cast("double")).cast("decimal(18,9)").as("__t"))
        .agg(sum(col("__t")).cast("decimal(38,9)").as("__st"),
          sum(col("__n")).as("__nn"))
        .select(graft.functions.Quantize.scaledFloor(
          col("__st").cast("double") / col("__nn").cast("double"), 6)
          .as("brier_cal"))
      raw.crossJoin(broadcast(cal))
    }),

    // The calibration loop OUT-OF-SAMPLE (closing q257's documented
    // caveat): hashSplit the scored docs, fit the PAV map on the train
    // half only, score the held-out half — raw vs calibrated Brier on
    // data the calibrator never saw, the form a production scorer ships.
    "q258_oos_calibration" -> ((s, d) => {
      val scored = TextAnalysis.hashedLinearScore(
        Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang")),
        "doc_id", "text", qualityWeights, bias = -0.5)
        .select(col("doc_id"), col("quality_score"),
          (col("lang") === "en").as("label"))
      val split = Sampling.hashSplit(scored, "doc_id",
        Seq("train" -> 0.5, "test" -> 0.5), "cal1")
      Profiler.oosCalibratedBrier(split, "split", "train",
        "quality_score", "label", bins = 10)
    }),

    // Exact isotonic (PAV) calibration of the same scorer — the monotone
    // confidence→probability map the q203/q255 diagnosis calls for.
    "q256_isotonic" -> ((s, d) => {
      val scored = TextAnalysis.hashedLinearScore(
        Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang")),
        "doc_id", "text", qualityWeights, bias = -0.5)
      Profiler.isotonicCalibration(
        scored.withColumn("label", col("lang") === "en"),
        "quality_score", "label", bins = 10)
        .orderBy(col("bin"))
    }),

    // Per-segment permutation sweep + Benjamini–Hochberg FDR: WHICH
    // event-type segments moved, with the multiple-comparisons control
    // every segment sweep needs before anyone reads it.
    "q251_fdr_segments" -> ((s, d) => {
      val perUserType = Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("engagement"))
      val assigned = Sampling.hashSplit(perUserType, "user_id",
        Seq("a" -> 0.5, "b" -> 0.5), "exp1")
      val tests = graft.operators.Experiment.permutationTestByGroup(assigned,
        Seq("event_type"), "user_id", "split", "engagement",
        reps = 100, salt = "perm1")
      graft.operators.Inference.bhAdjust(tests, "p_value", Seq("event_type"),
        alpha = 0.1)
        .orderBy(col("event_type"))
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

    // INCREMENTAL SCD2 maintenance: history built from pre-cutoff events,
    // the post-cutoff batch merged WITHOUT replaying history — must equal
    // the from-scratch assembly row for row (q151's own oracle is the
    // gate).
    "q197_scd2_merge" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val cutoff = lit("2024-01-04").cast("timestamp")
      val existing = graft.operators.Scd.scd2(
        ev.filter(col("ts") < cutoff), "user_id", Seq("ts", "event_id"), "event_type")
      graft.operators.Scd.scd2Merge(existing, ev.filter(col("ts") >= cutoff),
        "user_id", Seq("ts", "event_id"), "event_type")
        .orderBy(col("user_id"), col("version"))
    }),

    // Score-decile lift of the trained NB quality model (q117's scorer):
    // deciles assigned by percentile THRESHOLDS (one bounded aggregation
    // broadcast back, never a global ntile sort), per-decile positive
    // rate and lift vs base rate — the model-evaluation lift chart.
    "q198_score_lift" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang"))
      val weights = TextAnalysis.collectNaiveBayesModel(
        TextAnalysis.trainNaiveBayesWeights(docs, "text", col("lang") === "en", buckets = 64),
        buckets = 64)
      val bias = TextAnalysis.naiveBayesPrior(docs, col("lang") === "en")
        .select(round(col("bias"), 6)).head().getDouble(0)
      val scored = TextAnalysis.hashedLinearScore(docs.select(col("doc_id"), col("text")),
        "doc_id", "text", weights, bias)
        .join(docs.select(col("doc_id"), (col("lang") === "en").as("__pos"))
          .hint("shuffle_merge"), Seq("doc_id"))
      val cuts = scored.agg(
        expr("percentile(quality_score, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("__t"))
      val decile = (1 to 9).map(i =>
        when(col("quality_score") > element_at(col("__t"), i), 1).otherwise(0))
        .reduce(_ + _) + lit(1)
      val byDecile = scored.crossJoin(broadcast(cuts))
        .select(decile.as("decile"), col("__pos"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), sum(col("__pos").cast("long")).as("n_pos"))
      val totals = byDecile.agg(sum(col("n")).cast("double").as("__t"),
        sum(col("n_pos")).cast("double").as("__tp"))
      byDecile.crossJoin(broadcast(totals))
        .select(col("decile"), col("n"), col("n_pos"),
          graft.functions.Quantize.scaledFloor(
            col("n_pos") / col("n").cast("double"), 6).as("pos_rate"),
          graft.functions.Quantize.scaledFloor(
            (col("n_pos") / col("n").cast("double")) / (col("__tp") / col("__t")), 6)
            .as("lift"))
        .orderBy(col("decile"))
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

    // Pearson correlation per return flag from exact decimal sufficient
    // statistics — deterministic under any sharding, no float corpus sums.
    "q195_corr" -> ((s, d) => {
      Profiler.pearsonByGroup(Tables.lineitem(s, d),
        Seq("l_returnflag"), "l_quantity", "l_extendedprice", decimalScale = 2)
        .orderBy(col("l_returnflag"))
    }),

    // Multi-touch linear attribution: every purchase splits one unit of
    // credit equally across ALL the user's clicks in the 7-day lookback
    // (q182's last-touch generalized) — user-keyed SMJ join, per-purchase
    // touch counts, per-click credit sums; scaled-floor quantized since
    // the 1/n credit sum is float-accumulated.
    "q192_multitouch" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("cts"))
      val matched = clicks.hint("shuffle_merge")
        .join(purchases.hint("shuffle_merge"), Seq("user_id"))
        .filter(col("cts") <= col("pts") &&
          col("cts") >= col("pts") - lit(7L * 86400L * 1000000L))
      val perPurchase = matched.groupBy(col("purchase_id")).agg(count(lit(1)).as("__np"))
      matched.join(perPurchase.hint("shuffle_merge"), Seq("purchase_id"))
        // per-purchase 1/n credit quantized to a 1e-7 integer grid before
        // summing — the order-free form (see klFromCorpus); 1/n is a single
        // division, the same double in any engine
        .withColumn("__c7",
          floor(lit(1.0) / col("__np") * lit(1.0e7) + lit(0.5)).cast("long"))
        .groupBy(col("click_id"))
        .agg(count(lit(1)).as("n_purchases"),
          graft.functions.Quantize.scaledFloor(
            sum(col("__c7")).cast("double") / lit(1.0e7), 6).as("credit"))
        .orderBy(col("click_id"))
    }),

    // First-order Markov transition matrix over per-user event sequences:
    // P(next_type | type) from adjacent pairs — the behavioral-model /
    // bot-detection fingerprint; a single exact-integer division per cell
    // (same double both engines), scaled-floor quantized.
    "q193_markov" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .select(col("event_type").as("from_type"), col("next_type").as("to_type"))
      val counts = trans.groupBy(col("from_type"), col("to_type")).agg(count(lit(1)).as("cnt"))
      val totals = counts.groupBy(col("from_type")).agg(sum(col("cnt")).as("__tot"))
      counts.join(broadcast(totals), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("cnt"),
          graft.functions.Quantize.scaledFloor(
            col("cnt") / col("__tot").cast("double"), 6).as("prob"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // Coordinated cross-table sampling: the SAME salted 10% hash gate on
    // the user key of two fact tables yields a consistent entity sample
    // with no coordination infrastructure — every sampled user appears
    // with ALL their events and orders (the debug-at-scale primitive).
    "q190_coordinated_sample" -> ((s, d) => {
      val evS = Sampling.deterministicSample(
        Tables.events(s, d).select(col("user_id"), col("event_id")),
        "user_id", 0.1, "coord")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      val ordS = Sampling.deterministicSample(
        Tables.orders(s, d).select(col("o_custkey").as("user_id"), col("o_orderkey")),
        "user_id", 0.1, "coord")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_orders"))
      evS.hint("shuffle_merge")
        .join(ordS.hint("shuffle_merge"), Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy(col("user_id"))
    }),

    // Zipf fit of the token distribution over the top-1000 ranks — the
    // vocabulary-anomaly card statistic (natural text ~ slope -1).
    "q149_zipf" -> ((s, d) => {
      TextAnalysis.zipfFit(Tables.documents(s, d), "text", topRanks = 1000)
    }),

    // IVF-PQ end to end (the FAISS IVFx,PQy shape): 4 coarse cells
    // (vec_id % 125 == 0 as centroids), PQ codebooks initialized from the
    // 4 lowest-id RESIDUALS, residual-encoded corpus, nprobe=2 ADC
    // retrieval where score = probe·centroid + Σ code lookups. All three
    // quantizers unrolled in the oracle; selection on round(score, 4).
    "q145_ivfpq_adc" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cents = e.filter(col("vec_id") % 125 === 0)
        .select((col("vec_id") / 125).cast("long").as("cid"), col("embedding").as("cvec"))
      val resid = Similarity.ivfResiduals(e, "vec_id", "embedding", cents, "cid", "cvec")
      val books = Similarity.pqTrain(resid, "vec_id", "residual",
        m = 4, ksub = 4, dim = 64, iterations = 0)
      val encoded = Similarity.ivfPqEncode(e, "vec_id", "embedding",
        cents, "cid", "cvec", books, m = 4, dim = 64)
      Similarity.ivfPqTopK(encoded, "vec_id", cents, "cid", "cvec", books,
        probes = e.filter(col("vec_id") < 5), probeId = "vec_id", probeCol = "embedding",
        k = 5, m = 4, dim = 64, nprobe = 2, scoreScale = 4)
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // Rolling z-score anomaly flag over per-user event values: each value
    // scored against its own key's 10 PRIOR rows (leakage-free frame),
    // event_id tie-break so the window order is engine-deterministic.
    "q146_rolling_zscore" -> ((s, d) => {
      graft.operators.TimeSeries.rollingZScore(
        Tables.events(s, d).select(col("user_id"), col("ts"), col("event_id"), col("value")),
        "user_id", Seq("ts", "event_id"), "value", lookback = 10, threshold = 2.0)
        .orderBy(col("user_id"), col("ts"), col("event_id"))
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

    // Ordered funnel (view -> click -> purchase): per-user reach times
    // where each step's event must follow the previous step's earliest
    // reach — k-1 keyed join+min-aggregations, no per-user window, no
    // event-array collection (the bot-user-proof shape).
    "q141_funnel" -> ((s, d) => {
      graft.operators.Funnel.funnelTimes(Tables.events(s, d),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
        .orderBy(col("user_id"))
    }),

    // Weekly cohort retention: first-seen bucket x activity offset with
    // distinct (user, bucket) pre-aggregation — never a countDistinct
    // over a corpus-wide group.
    "q142_cohort" -> ((s, d) => {
      graft.operators.Funnel.cohortRetention(Tables.events(s, d), "user_id", "ts",
        bucketDays = 7)
        .orderBy(col("cohort"), col("offset"))
    }),

    // Bloom-prefiltered fact⋈dim join: the dim key set compressed to a
    // 2^15-bit bitmap, fact rows probed per-row before the shuffle; no
    // false negatives, so the aggregate equals the plain join's (the
    // oracle ignores the bloom entirely).
    "q143_bloom_join" -> ((s, d) => {
      val dim = Tables.supplier(s, d).filter(col("s_suppkey") % 7 === 0)
        .select(col("s_suppkey"), col("s_name"))
      Skew.bloomPrefilteredJoin(
        Tables.lineitem(s, d).select(col("l_suppkey"), col("l_quantity")),
        dim, "l_suppkey", "s_suppkey", mBits = 1 << 15, kHashes = 4)
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("decimal(28,4)")).cast("double").as("sum_qty"))
        .orderBy(col("s_suppkey"))
    }),

    // Per-language value-distribution histogram of n_chars: 16 equal-width
    // bins over a literal domain, out-of-domain values clamped to the edge
    // bins — integer bucket arithmetic shared with the z-order bucketizer.
    "q144_histogram" -> ((s, d) => {
      Profiler.histogram(Tables.documents(s, d), "n_chars", Seq("lang"),
        minV = 0L, maxV = 4095L, bins = 16)
        .orderBy(col("lang"), col("bin"))
    }),

    // The C4 cleaning rules (Raffel et al. 2020) over documents with
    // deterministically planted line structure: a terminal-punct good
    // line, a too-short line, and modular javascript / lorem-ipsum /
    // curly-brace plants exercising every rule. Pure per-row projection.
    "q135_c4_rules" -> ((s, d) => {
      val lined = Tables.documents(s, d).select(col("doc_id"), concat_ws("\n",
        concat(col("text"), lit(".")),
        lit("short line."),
        when(col("doc_id") % 6 === 0, lit("Enable javascript to view this page properly."))
          .otherwise(lit("Another perfectly fine sentence with enough words here.")),
        when(col("doc_id") % 9 === 0, lit("Lorem ipsum dolor sit amet consectetur adipiscing elit."))
          .otherwise(lit("A third full sentence keeps the document alive today.")),
        when(col("doc_id") % 11 === 0, lit("function f() { return 1; }"))
          .otherwise(lit("no braces here just words without terminal punctuation"))).as("text"))
      TextAnalysis.c4Clean(lined, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // HITS hubs/authorities over the q103 link graph: 2 L1-normalized
    // iterations, both unrolled in the oracle; document sources are pure
    // hubs (no in-links), site/blocked domains pure authorities.
    "q136_hits" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val siteLinks = docs.filter(col("doc_id") % 11 =!= 0)
        .select(col("source").as("src"),
          concat(lit("site"), (col("doc_id") % 20).cast("string"),
            lit(".example.com")).as("dst"))
      val badLinks = docs.filter(col("doc_id") % 3 === 0)
        .select(col("source").as("src"),
          concat(lit("blocked"), (col("doc_id") % 5).cast("string"),
            lit(".bad.net")).as("dst"))
      graft.operators.Graph.hits(siteLinks.union(badLinks), "src", "dst", iterations = 2)
        .select(col("node"), round(col("hub"), 6).as("hub"), round(col("auth"), 6).as("auth"))
        .orderBy(col("node"))
    }),

    // Cavnar-Trenkle character-trigram language ID: rank profiles trained
    // on the even-doc half, odd docs classified by integer out-of-place
    // distance — no float anywhere, so prediction is engine-exact.
    "q137_trigram_langid" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val profiles = TextAnalysis.trainTrigramProfiles(
        docs.filter(col("doc_id") % 2 === 0), "lang", "text", topN = 20)
      TextAnalysis.classifyByTrigramProfiles(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", profiles, topN = 20)
        .orderBy(col("doc_id"))
    }),

    // Mergeable partial-aggregate rollup: two shard partials (even/odd
    // docs) merged == the from-scratch aggregate — the incremental
    // metrics-store contract (integer sums make the merge bit-exact
    // regardless of shard boundaries or merge order).
    "q139_rollup_merge" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val gens = Seq(docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
        .map(g => Rollup.partial(g, Seq("lang"), "n_chars"))
      Rollup.finalize(Rollup.merge(gens, Seq("lang")))
        .orderBy(col("lang"))
    }),

    // Weighted sampling without replacement (Efraimidis-Spirakis bottom-k):
    // 100 docs drawn with inclusion probability proportional to n_chars —
    // priorities quantized at 1e-9 before the TakeOrdered selection so the
    // sample membership is engine-stable (ln differs at ulp across libms).
    "q134_weighted_sample" -> ((s, d) => {
      Sampling.weightedBottomK(Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 100, salt = "ws1")
        .orderBy(col("doc_id"))
    }),

    // Deterministic corpus shuffle: every doc's global training position +
    // shard as a pure function of (salt, doc_id) — the reproducible
    // training-order primitive, via the two-phase prefix sum (never one
    // global row_number task). Oracle = the serial row_number definition.
    "q138_shuffle" -> ((s, d) => {
      Sampling.deterministicShuffle(Tables.documents(s, d).select(col("doc_id")),
        "doc_id", rowsPerShard = 1000L, salt = "sh1")
        .orderBy(col("doc_id"))
    }),

    // Deterministic negative sampling for contrastive pairs: 3 draws per
    // anchor, draw j = the doc at shuffle position hash(anchor#j) mod N;
    // self-hits dropped by contract. Uniform per draw, reproducible
    // everywhere, and the position-map join is SMJ-pinned both sides.
    "q140_negative_sample" -> ((s, d) => {
      Sampling.negativeSample(Tables.documents(s, d).select(col("doc_id")),
        "doc_id", k = 3, salt = "ns1")
        .orderBy(col("anchor_id"), col("draw"))
    }),

    // Z-order (Morton) clustering key: min/max-scaled 8-bit buckets of
    // (l_partkey, l_suppkey) bit-interleaved — pure integer arithmetic end
    // to end, so the curve an engine lays files along is reproducible by
    // any other. The min/max scalars are a 1-row driver-side aggregate
    // (the parquetZOrdered contract — scalar by construction, q93's
    // collect class); the z computation itself is a shuffle-free
    // projection. The layout effect (bounded per-file rectangles in BOTH
    // dims) is pinned by ClusteredWriteSpec.
    "q133_zorder" -> ((s, d) => {
      import graft.sinks.ClusteredWrite
      val l = Tables.lineitem(s, d)
      val mm = l.agg(
        min(col("l_partkey")).cast("long"), max(col("l_partkey")).cast("long"),
        min(col("l_suppkey")).cast("long"), max(col("l_suppkey")).cast("long")).head()
      val bx = ClusteredWrite.zBucket(col("l_partkey"), mm.getLong(0), mm.getLong(1), 8)
      val by = ClusteredWrite.zBucket(col("l_suppkey"), mm.getLong(2), mm.getLong(3), 8)
      l.select(col("l_orderkey"), col("l_linenumber"),
          ClusteredWrite.zValue(Seq(bx, by), 8).as("zval"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })
  )

  /** q166's oracle is GENERATED like q33's: every band key re-derived in
    * DuckDB from the same plane literals, occupancy and pair counts pure
    * integers. */
  private def lshOccupancyOracle: String = {
    val planes = graft.operators.Similarity.hyperplanes(dim = 64, nBits = 32)
    val bandExprs = (0 until 8).map { k =>
      val key = (0 until 4).map { i =>
        s"(CASE WHEN list_inner_product(v, [${planes(k * 4 + i).mkString(", ")}]) >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $k AS band, $key AS key FROM e"
    }.mkString(" UNION ALL ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      keys AS ($bandExprs),
      occ AS (SELECT band, key, count(*) AS c FROM keys GROUP BY band, key)
      SELECT band, count(*) AS n_buckets, max(c) AS max_occupancy,
             CAST(sum(c * (c - 1) // 2) AS BIGINT) AS candidate_pairs
      FROM occ GROUP BY band ORDER BY band"""
  }

  /** q61's oracle is GENERATED like q33's, closing the suite's last
    * rows-only gate: the production-configuration recall measurement is
    * fully deterministic (splitmix-derived planes, sign-flip perturbation
    * from `sin` of an integer argument — DuckDB's and the JVM's `sin` can
    * differ in the last ulp but never in SIGN for nonzero integer inputs,
    * and only the sign reaches the arithmetic), so DuckDB re-derives the
    * planted corpus, all 16 band buckets (from the same plane literals as
    * q33/q166), the verified LSH pair set, the 1:1 truth pairs, and the
    * identical summary row. Every float step mirrors the Spark plan's op
    * order: float element promoted to double, perturbed, cast back through
    * float; dot products summed left-to-right (`list_inner_product` ≡
    * `fastDot`); cosine as dot/(sqrt(aa)·sqrt(bb)); recall through the
    * [[graft.functions.Quantize.scaledFloor]] convention. */
  private def lshProdRecallOracle: String = {
    val dim = 64
    val bandBits = 8
    val bands = 16
    val idOffset = 100000000L
    val planes = graft.operators.Similarity.hyperplanes(dim, bandBits * bands)
    // planted twin: element i of v (double, exact image of the float) times
    // (1.0 + 0.6*sign(sin(orig_id*37 + i))), rounded through FLOAT exactly
    // as Spark's `.cast("float")`, then back to double for LSH/verify
    val perturbed = (0 until dim).map { i =>
      s"CAST(CAST(v[${i + 1}] * (1.0 + 0.6 * sign(sin(CAST(orig_id * 37 + $i AS DOUBLE)))) AS FLOAT) AS DOUBLE)"
    }.mkString("[", ", ", "]")
    val bandSelects = (0 until bands).map { k =>
      val key = (0 until bandBits).map { i =>
        s"(CASE WHEN list_inner_product(v, [${planes(k * bandBits + i).mkString(", ")}]) >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $k AS band, $key AS key FROM corpus"
    }.mkString(" UNION ALL ")
    s"""
      WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      planted AS (
        SELECT orig_id + $idOffset AS vec_id, $perturbed AS v
        FROM (SELECT vec_id AS orig_id, v FROM base WHERE vec_id % 5 = 0)),
      corpus AS (SELECT vec_id, v FROM base UNION ALL SELECT vec_id, v FROM planted),
      keys AS ($bandSelects),
      cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM keys a JOIN keys b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
      verified AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN corpus ca ON ca.vec_id = c.id_a
        JOIN corpus cb ON cb.vec_id = c.id_b
        WHERE round(list_inner_product(ca.v, cb.v)
                / (sqrt(list_inner_product(ca.v, ca.v)) * sqrt(list_inner_product(cb.v, cb.v))), 6) >= 0.8),
      truth AS (
        SELECT b.vec_id AS id_a, p.vec_id AS id_b,
               list_inner_product(b.v, p.v)
                 / (sqrt(list_inner_product(b.v, b.v)) * sqrt(list_inner_product(p.v, p.v))) AS cos
        FROM base b JOIN planted p ON p.vec_id = b.vec_id + $idOffset),
      agg AS (SELECT
        (SELECT count(*) FROM truth) AS planted,
        (SELECT count(*) FROM truth WHERE round(cos, 6) >= 0.8) AS eligible,
        (SELECT count(*) FROM verified v JOIN truth t
           ON v.id_a = t.id_a AND v.id_b = t.id_b AND round(t.cos, 6) >= 0.8) AS found,
        (SELECT count(*) FROM verified) AS lsh_pairs)
      SELECT planted, eligible, found, lsh_pairs,
             CAST(floor(CAST(found AS DOUBLE) / CAST(eligible AS DOUBLE) * 10000.0 + 0.5) AS DOUBLE) / 10000.0 AS recall
      FROM agg"""
  }

  /** q205's oracle is GENERATED: the RBO weight table W[m] (1e-9 integer
    * grid, [[graft.operators.TextAnalysis.rboWeightGrid]]) and the (1−p)
    * factor embed as literals, so the per-pair contributions and the
    * final scaled-floor are the identical doubles. */
  private def rboOracle: String = {
    val wq = graft.operators.TextAnalysis.rboWeightGrid(0.9, 10)
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      sc8 AS (SELECT vec_id,
                     list_max([CAST(abs(y) AS DOUBLE) for y in embedding]) / 127.0 AS scale
              FROM embeddings),
      dq AS (SELECT e.vec_id,
                    CASE WHEN scale = 0
                         THEN [CAST(0 AS DOUBLE) for x in v]
                         ELSE [CAST(round(x / scale) AS INTEGER) * scale for x in v]
                    END AS v
             FROM e JOIN sc8 ON e.vec_id = sc8.vec_id),
      pa AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
      pb AS (SELECT vec_id AS probe_id, v AS pv FROM dq WHERE vec_id < 5),
      sa AS (SELECT probe_id, e.vec_id AS nbr_id,
                    list_inner_product(pv, e.v) /
                      (sqrt(list_inner_product(pv, pv)) * sqrt(list_inner_product(e.v, e.v))) AS cs
             FROM pa CROSS JOIN e WHERE e.vec_id != probe_id),
      sb AS (SELECT probe_id, dq.vec_id AS nbr_id,
                    list_inner_product(pv, dq.v) /
                      (sqrt(list_inner_product(pv, pv)) * sqrt(list_inner_product(dq.v, dq.v))) AS cs
             FROM pb CROSS JOIN dq WHERE dq.vec_id != probe_id),
      ra AS (SELECT probe_id, nbr_id,
                    row_number() OVER (PARTITION BY probe_id ORDER BY cs DESC, nbr_id) AS r
             FROM sa),
      rb AS (SELECT probe_id, nbr_id,
                    row_number() OVER (PARTITION BY probe_id ORDER BY cs DESC, nbr_id) AS r
             FROM sb),
      j AS (SELECT ra.probe_id, greatest(ra.r, rb.r) AS m
            FROM ra JOIN rb ON ra.probe_id = rb.probe_id AND ra.nbr_id = rb.nbr_id
            WHERE ra.r <= 10 AND rb.r <= 10),
      wt AS (SELECT [${wq.mkString("CAST(", " AS BIGINT), CAST(", " AS BIGINT)")}] AS t)
      SELECT probe_id, count(*) AS overlap_at_depth,
             CAST(floor(CAST(sum(t[m]) AS DOUBLE) / 1000000000.0 * ${1.0 - 0.9}
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS rbo
      FROM j CROSS JOIN wt GROUP BY probe_id ORDER BY probe_id"""
  }

  /** q206's oracle is GENERATED: the λ and 1−λ factors embed as the exact
    * Scala doubles (1−0.7 is 0.30000000000000004 — interpolation emits
    * the round-tripping shortest form), and the five greedy steps unroll
    * as argmax CTEs with the same quantize-then-tie-break rule. */
  private def mmrOracle: String = {
    val lam = 0.7
    val oneMinus = 1.0 - lam
    def fl6(x: String) = s"CAST(floor(($x) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0"
    def cosTo(sel: String) =
      s"""CASE WHEN sqrt(list_inner_product(r.v, r.v)) > 0 AND sqrt(list_inner_product($sel.v, $sel.v)) > 0
               THEN list_inner_product(r.v, $sel.v) /
                    (sqrt(list_inner_product(r.v, r.v)) * sqrt(list_inner_product($sel.v, $sel.v)))
               ELSE 0.0 END"""
    // step n: score remaining candidates against the already-selected
    // rows, take the quantized argmax (ties to the lowest id)
    val steps = (2 to 5).map { n =>
      val prevSel = (1 until n).map(i => s"s$i")
      val joins = prevSel.map(si => s"CROSS JOIN $si").mkString(" ")
      val red = prevSel.map(si => cosTo(si)).mkString("greatest(", ", ", ")")
      val notIn = prevSel.map(si => s"r.id != $si.id").mkString(" AND ")
      s"""
      sc$n AS (SELECT r.id, r.v, ${fl6(s"$lam * r.rel - $oneMinus * $red")} AS s
               FROM c r $joins WHERE $notIn),
      s$n AS (SELECT id, v, s FROM sc$n ORDER BY s DESC, id LIMIT 1)"""
    }.mkString(",")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      pr AS (SELECT v AS pv FROM e WHERE vec_id = 0),
      c AS (SELECT vec_id AS id, v,
                   list_inner_product(pv, v) /
                     (sqrt(list_inner_product(pv, pv)) * sqrt(list_inner_product(v, v))) AS rel
            FROM e CROSS JOIN pr WHERE vec_id > 0),
      sc1 AS (SELECT id, v, ${fl6(s"$lam * rel - $oneMinus * 0.0")} AS s FROM c),
      s1 AS (SELECT id, v, s FROM sc1 ORDER BY s DESC, id LIMIT 1),$steps
      SELECT CAST(1 AS INTEGER) AS rank, id AS vec_id, s AS mmr_score FROM s1
      UNION ALL SELECT 2, id, s FROM s2
      UNION ALL SELECT 3, id, s FROM s3
      UNION ALL SELECT 4, id, s FROM s4
      UNION ALL SELECT 5, id, s FROM s5
      ORDER BY rank"""
  }

  /** q33's oracle is GENERATED: the sign-LSH bucketing is deterministic
    * (fixed splitmix-derived hyperplanes), so the oracle SQL re-derives the
    * buckets in DuckDB from the same plane constants, embedded as literals.
    * `Double.toString` round-trips, so the re-parsed planes are
    * bit-identical and both engines dot them in the same element order.
    */
  private def lshAnnOracle: String = {
    val sig = graft.operators.Similarity.hyperplanes(dim = 64, nBits = 8)
      .zipWithIndex
      .map { case (p, j) =>
        s"(CASE WHEN list_inner_product(v, [${p.mkString(", ")}]) >= 0 THEN ${1L << j} ELSE 0 END)"
      }
      .mkString(" + ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      s AS (SELECT vec_id, v, $sig AS bucket FROM e),
      p AS (SELECT vec_id AS probe_id, v AS pv, bucket FROM s WHERE vec_id < 10),
      cand AS (
        SELECT probe_id, pv, s.vec_id AS nbr_id, s.v
        FROM p JOIN s USING (bucket) WHERE s.vec_id != probe_id),
      scored AS (
        SELECT probe_id, nbr_id, list_cosine_similarity(pv, v) AS sim,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY list_cosine_similarity(pv, v) DESC, nbr_id) AS rnk
        FROM cand)
      SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, nbr_id, round(sim, 4) + 0.0 AS cos_sim
      FROM scored WHERE rnk <= 5 ORDER BY probe_id, rnk"""
  }

  /** q106's oracle is GENERATED like q33's: the JL matrix is deterministic
    * (splitmix-derived Rademacher rows), so each projected component is
    * re-derived in DuckDB from the same plane constants as SQL literals;
    * parallel `unnest`s zip the dim index with the component list.
    */
  private def jlProjectOracle: String = {
    val planes = graft.operators.Similarity.jlPlanes(inDim = 64, outDim = 16)
    val ds = planes.indices.map(j => s"CAST($j AS INTEGER)").mkString(", ")
    val comps = planes
      .map(p => s"round(list_inner_product(v, [${p.mkString(", ")}]), 4) + 0.0")
      .mkString(",\n               ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT vec_id, unnest([$ds]) AS d,
             unnest([$comps]) AS comp
      FROM e ORDER BY vec_id, d"""
  }

  /** q107's oracle: project through the SPARSE Achlioptas planes (same
    * literal-embedding contract), then exact top-5 cosine in the projected
    * space, ranking on round(sim, 4) exactly as the Spark side's
    * scoreScale = 4 does. */
  private def jlAnnOracle: String = {
    val planes = graft.operators.Similarity.jlPlanes(inDim = 64, outDim = 16, sparse = true)
    val comps = planes
      .map(p => s"list_inner_product(v, [${p.mkString(", ")}])")
      .mkString(",\n               ")
    s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      p AS (SELECT vec_id, [$comps] AS jv FROM e),
      probes AS (SELECT vec_id AS probe_id, jv AS pv FROM p WHERE vec_id < 5),
      scored AS (
        SELECT pr.probe_id, p.vec_id AS nbr_id,
               round(list_cosine_similarity(p.jv, pr.pv), 4) AS sim
        FROM p JOIN probes pr ON p.vec_id != pr.probe_id),
      ranked AS (
        SELECT probe_id, nbr_id, sim,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY sim DESC, nbr_id) AS rnk
        FROM scored)
      SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, nbr_id, sim AS cos_sim
      FROM ranked WHERE rnk <= 5 ORDER BY probe_id, rnk"""
  }

  /** q32's oracle is GENERATED like q33's: the SimHash token hash is a
    * 60-bit md5 prefix both engines compute identically, so the oracle
    * rebuilds the per-bit majority vote, the signature, and the
    * hamming-<=-3 pairs in SQL (all-pairs is fine at oracle scale; the
    * Spark side buckets by 15-bit chunks and must find the same pairs).
    */
  private def simhashOracle: String = {
    val bits = graft.operators.Dedup.SimHashBits
    val votes = (0 until bits)
      .map(i => s"sum(CASE WHEN (th >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v$i")
      .mkString(",\n               ")
    val sig = (0 until bits)
      .map(i => s"(CASE WHEN v$i >= 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      h AS (
        SELECT doc_id,
               CAST(concat('0x', substring(md5(tok), 1, ${bits / 4})) AS BIGINT) AS th
        FROM toks),
      votes AS (
        SELECT doc_id,
               $votes
        FROM h GROUP BY doc_id),
      sig AS (SELECT doc_id, $sig AS s FROM votes)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.s, b.s)) <= 3
      ORDER BY id_a, id_b"""
  }

  private def simhashWeightedOracle: String = {
    val bits = graft.operators.Dedup.SimHashBits
    val votes = (0 until bits)
      .map(i => s"sum(CASE WHEN (th >> $i) & 1 = 1 THEN w ELSE -w END) AS v$i")
      .mkString(",\n               ")
    val sig = (0 until bits)
      .map(i => s"(CASE WHEN v$i >= 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""
      WITH dt AS (
        SELECT DISTINCT doc_id, tok FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
      dfc AS (SELECT tok, count(*) AS df FROM dt GROUP BY tok),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      h AS (
        SELECT t.doc_id,
               CAST(concat('0x', substring(md5(t.tok), 1, ${bits / 4})) AS BIGINT) AS th,
               CAST(round(ln(n.n / dfc.df) * 1000, 0) AS BIGINT) + 1 AS w
        FROM toks t JOIN dfc ON t.tok = dfc.tok CROSS JOIN n),
      votes AS (
        SELECT doc_id,
               $votes
        FROM h GROUP BY doc_id)
      SELECT doc_id, $sig AS simhash FROM votes ORDER BY doc_id"""
  }

  /** DuckDB form of [[Sampling.keyHash]]: same md5 60-bit prefix, same
    * integer threshold literals — the comparison is integer-exact on both
    * engines, so the oracle is the definition, not an approximation. */
  private def duckKeyHash(keyExpr: String, salt: String): String =
    s"CAST(concat('0x', substring(md5('$salt' || CAST($keyExpr AS VARCHAR)), 1, 15)) AS BIGINT)"

  /** Unrolled synchronous label-propagation oracle (the q136 HITS unroll
    * discipline): `edgeSql` must yield (s, d); each round is the same
    * count-DESC-then-min-label argmax the operator's max-struct computes. */
  private def lpaCtes(edgeSql: String, iterations: Int): String = {
    val iters = (1 to iterations).map { i =>
      s"""c$i AS (SELECT s.node, p.label, count(*) AS c
             FROM sym s JOIN l${i - 1} p ON p.node = s.nbr GROUP BY s.node, p.label),
      b$i AS (SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
                FROM c$i) WHERE rn = 1),
      l$i AS (SELECT n.node, coalesce(b.label, p.label) AS label
              FROM nodes n JOIN l${i - 1} p ON p.node = n.node
              LEFT JOIN b$i b ON b.node = n.node)"""
    }.mkString(",\n      ")
    s"""raw AS ($edgeSql),
      und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
              FROM raw WHERE s <> d),
      sym AS (SELECT a AS node, b AS nbr FROM und
              UNION ALL SELECT b, a FROM und),
      nodes AS (SELECT a AS node FROM und UNION SELECT b FROM und),
      l0 AS (SELECT node, node AS label FROM nodes),
      $iters"""
  }

  private def lpaOracle(edgeSql: String, iterations: Int): String =
    s"""
      WITH ${lpaCtes(edgeSql, iterations)}
      SELECT node, label FROM l$iterations ORDER BY node"""

  /** q228: the q218 LPA rounds (shared CTE builder) + Newman modularity —
    * exact integer edge/degree masses, the operator's two final divisions
    * mirrored. */
  private def modularityOracle(edgeSql: String, iterations: Int): String =
    s"""
      WITH ${lpaCtes(edgeSql, iterations)},
      lbl AS (SELECT node, label AS c FROM l$iterations),
      mm AS (SELECT count(*) AS m FROM und),
      intra AS (SELECT la.c AS ca, lb.c AS cb
                FROM und u JOIN lbl la ON la.node = u.a
                           JOIN lbl lb ON lb.node = u.b),
      ec AS (SELECT count(*) AS se FROM intra WHERE ca = cb),
      degc AS (SELECT c, count(*) AS deg
               FROM (SELECT ca AS c FROM intra UNION ALL SELECT cb FROM intra)
               GROUP BY c),
      dc AS (SELECT CAST(sum(deg * deg) AS BIGINT) AS sd2,
                    count(*) AS n_communities
             FROM degc)
      SELECT n_communities, CAST(m AS BIGINT) AS n_edges,
             CAST(floor((CAST(se AS DOUBLE) / CAST(m AS DOUBLE)
                         - CAST(sd2 AS DOUBLE)
                           / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)))
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS modularity
      FROM mm CROSS JOIN ec CROSS JOIN dc"""

  private val q218EdgeSql =
    """SELECT (a % 10) * 10 + (a // 10) % 10 AS s,
              (a % 10) * 10 + (a // 100) % 10 AS d
       FROM (SELECT doc_id % 1000 AS a FROM documents)
       UNION ALL
       SELECT a % 100 AS s, (a + 13) % 100 AS d
       FROM (SELECT doc_id % 1000 AS a FROM documents) WHERE a % 127 = 0"""

  /** q225's oracle, generated from the operator's OWN cumulative-Poisson
    * thresholds and alpha/2 double (`Double.toString` round-trips to the
    * identical double in DuckDB), so the inverse-CDF walk, the replicate
    * means, and the rank picks are engine-exact. */
  private def bootstrapCiOracle: String = {
    val wExpr = graft.operators.Profiler.poissonCdf1
      .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
    val lo2 = ((1.0 - 0.95) / 2.0).toString
    val h = duckKeyHash("id || ':' || CAST(b AS VARCHAR)", "bci")
    s"""
      WITH rows_ AS (SELECT CAST(doc_id AS VARCHAR) AS id, CAST(n_chars AS BIGINT) AS v
                     FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
      pt AS (SELECT count(*) AS n_rows, CAST(sum(v) AS BIGINT) AS sv FROM rows_),
      ex AS (SELECT id, v, b FROM rows_
             CROSS JOIN (SELECT unnest(range(1, 201)) AS b)),
      uu AS (SELECT b, v,
                    (CAST($h AS DOUBLE) + 0.5) / 1152921504606846976.0 AS u
             FROM ex),
      ww AS (SELECT b, v, $wExpr AS w FROM uu),
      rs AS (SELECT b, CAST(sum(w * v) AS BIGINT) AS swv, CAST(sum(w) AS BIGINT) AS sw
             FROM ww GROUP BY b HAVING sum(w) > 0),
      m9 AS (SELECT b, CAST(floor(CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE)
                                  * 1000000000.0 + 0.5) AS BIGINT) AS m9
             FROM rs),
      rk AS (SELECT m9, b, count(*) OVER () AS m,
                    row_number() OVER (ORDER BY m9, b) AS rn
             FROM m9),
      pick AS (SELECT m9, rn, m,
                      greatest(CAST(1 AS BIGINT),
                               CAST(floor(CAST(m AS DOUBLE) * $lo2) AS BIGINT)) AS lor
               FROM rk),
      ci AS (SELECT max(m) AS reps_used, min(m9) AS lo9, max(m9) AS hi9
             FROM pick WHERE rn = lor OR rn = m - lor + 1)
      SELECT pt.n_rows, ci.reps_used,
             CAST(floor(CAST(pt.sv AS DOUBLE) / CAST(pt.n_rows AS DOUBLE)
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS mean,
             CAST(floor(CAST(ci.lo9 AS DOUBLE) / 1000000000.0
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS ci_lo,
             CAST(floor(CAST(ci.hi9 AS DOUBLE) / 1000000000.0
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS ci_hi
      FROM pt CROSS JOIN ci"""
  }

  /** q230's oracle: hashSplit's exact boundary literal + the readout
    * formulas mirrored raw-then-quantized. */
  private def abReadoutOracle: String = {
    val b = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val h = duckKeyHash("user_id", "exp1")
    s"""
      WITH u AS (SELECT user_id,
                        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
                 FROM events GROUP BY user_id),
      asg AS (SELECT (conv = 1) AS c,
                     CASE WHEN $h < $b THEN 'a' ELSE 'b' END AS split
              FROM u),
      g AS (SELECT CAST(count(*) FILTER (WHERE split = 'a') AS BIGINT) AS n_a,
                   CAST(count(*) FILTER (WHERE split = 'b') AS BIGINT) AS n_b,
                   CAST(count(*) FILTER (WHERE split = 'a' AND c) AS BIGINT) AS conv_a,
                   CAST(count(*) FILTER (WHERE split = 'b' AND c) AS BIGINT) AS conv_b
            FROM asg),
      r AS (SELECT n_a, n_b, conv_a, conv_b,
                   CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ra,
                   CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rb,
                   CAST(conv_a + conv_b AS DOUBLE)
                     / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pooled,
                   (CAST(n_a AS DOUBLE)
                    - (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) * 0.5)
                     / sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) * 0.5 * 0.5)
                     AS zs
            FROM g)
      SELECT n_a, n_b, conv_a, conv_b,
             CAST(floor(ra * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS rate_a,
             CAST(floor(rb * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS rate_b,
             CASE WHEN conv_a > 0
                  THEN CAST(floor((rb - ra) / ra * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS lift,
             CASE WHEN pooled > 0.0 AND pooled < 1.0
                  THEN CAST(floor((rb - ra) / sqrt(pooled * (1.0 - pooled)
                         * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS z_conv,
             CAST(floor(zs * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS z_srm,
             (abs(zs) > 3.0) AS srm_flag
      FROM r"""
  }

  /** q231's oracle: the per-user triple + quantile_cont thresholds (the
    * q198 percentile mirror) + the 1-5 scoring CASE sums, generated. */
  private def rfmOracle: String = {
    def above(v: String, arr: String) = (1 to 4)
      .map(i => s"(CASE WHEN CAST($v AS DOUBLE) > $arr[$i] THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""
      WITH ev AS (SELECT user_id, ts,
                         CASE WHEN event_type = 'purchase' THEN event_id % 50 + 1
                              ELSE 0 END AS amount
                  FROM events),
      ref AS (SELECT max(CAST(ts AS DATE)) AS r FROM ev),
      pu AS (SELECT user_id, max(CAST(ts AS DATE)) AS lastd, count(*) AS frequency,
                    CAST(sum(amount) AS BIGINT) AS monetary
             FROM ev GROUP BY user_id),
      pr AS (SELECT user_id, date_diff('day', lastd, r) AS recency, frequency, monetary
             FROM pu CROSS JOIN ref),
      cuts AS (SELECT quantile_cont(recency, [0.2, 0.4, 0.6, 0.8]) AS rc,
                      quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fc,
                      quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mc
               FROM pr),
      s AS (SELECT user_id, recency, frequency, monetary,
                   5 - (${above("recency", "rc")}) AS r_score,
                   1 + (${above("frequency", "fc")}) AS f_score,
                   1 + (${above("monetary", "mc")}) AS m_score
            FROM pr CROSS JOIN cuts)
      SELECT user_id, recency, frequency, monetary, r_score, f_score, m_score,
             CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
               || CAST(m_score AS VARCHAR) AS segment
      FROM s ORDER BY user_id"""
  }

  /** q237's oracle: the hashSplit arm boundary + Welch's closed form on
    * exact per-arm decimal sums, every double op in the operator's
    * evaluation order. */
  private def welchOracle: String = {
    val b = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val h = duckKeyHash("user_id", "exp1")
    s"""
      WITH u AS (SELECT user_id, count(*) AS v FROM events GROUP BY user_id),
      asg AS (SELECT CASE WHEN $h < $b THEN 'a' ELSE 'b' END AS arm,
                     CAST(v AS DECIMAL(18,2)) AS x
              FROM u),
      g AS (SELECT
              CAST(count(*) FILTER (WHERE arm = 'a') AS BIGINT) AS n_a,
              CAST(count(*) FILTER (WHERE arm = 'b') AS BIGINT) AS n_b,
              CAST(sum(x) FILTER (WHERE arm = 'a') AS DECIMAL(38,8)) AS sa,
              CAST(sum(x) FILTER (WHERE arm = 'b') AS DECIMAL(38,8)) AS sb,
              CAST(sum(CAST(x * x AS DECIMAL(38,8))) FILTER (WHERE arm = 'a')
                AS DECIMAL(38,8)) AS ssa,
              CAST(sum(CAST(x * x AS DECIMAL(38,8))) FILTER (WHERE arm = 'b')
                AS DECIMAL(38,8)) AS ssb
            FROM asg),
      t AS (SELECT n_a, n_b,
                   CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
                   CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
                   (CAST(n_a AS DOUBLE) * CAST(ssa AS DOUBLE)
                    - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                     / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0))
                     / CAST(n_a AS DOUBLE) AS sea,
                   (CAST(n_b AS DOUBLE) * CAST(ssb AS DOUBLE)
                    - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
                     / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0))
                     / CAST(n_b AS DOUBLE) AS seb
            FROM g)
      SELECT n_a, n_b,
             CAST(floor(ma * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS mean_a,
             CAST(floor(mb * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS mean_b,
             CASE WHEN n_a >= 2 AND n_b >= 2 AND sea + seb > 0.0
                  THEN CAST(floor((mb - ma) / sqrt(sea + seb) * 1000000.0 + 0.5)
                         AS DOUBLE) / 1000000.0
             END AS t_stat,
             CASE WHEN n_a >= 2 AND n_b >= 2 AND sea + seb > 0.0
                  THEN CAST(floor((sea + seb) * (sea + seb)
                         / (sea * sea / (CAST(n_a AS DOUBLE) - 1.0)
                            + seb * seb / (CAST(n_b AS DOUBLE) - 1.0))
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS df_welch
      FROM t"""
  }

  /** q244's oracle: the β literals embedded as the EXACT Scala doubles
    * (1.0 − 0.999 is 0.001000…0009 in IEEE — writing `1.0 - 0.999` in SQL
    * would make DuckDB fold it in exact decimal and diverge), per-class
    * 1e-9-quantized ENS terms summed as decimal. */
  private def classWeightsOracle: String = {
    val beta = 0.999
    val oneMinus = 1.0 - beta // the exact double the operator's lit() carries
    s"""
      WITH per AS (SELECT lang AS class, CAST(count(*) AS BIGINT) AS n
                   FROM documents WHERE lang IS NOT NULL GROUP BY 1),
      p2 AS (SELECT class, n,
                    CAST(CAST(floor($oneMinus
                        / (1.0 - power($beta, CAST(n AS DOUBLE)))
                        * 1000000000.0 + 0.5) AS DOUBLE)
                      / 1000000000.0 AS DECIMAL(18,9)) AS raw
             FROM per),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS tot,
                     CAST(sum(raw) AS DECIMAL(38,9)) AS sraw
              FROM p2)
      SELECT class, n,
             CAST(floor(CAST(tot AS DOUBLE)
                 / (CAST(k AS DOUBLE) * CAST(n AS DOUBLE))
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS inv_weight,
             CAST(floor(CAST(k AS DOUBLE) * CAST(raw AS DOUBLE)
                 / CAST(sraw AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS ens_weight
      FROM p2 CROSS JOIN tot ORDER BY class"""
  }

  /** q246's oracle: the IPF row/col rescale unrolled 3 iterations (the
    * lpaCtes discipline), shares embedded as the exact Scala doubles and
    * every rescale quantized to the 1e-9 grid like the operator. */
  private def rakingOracle: String = {
    val rowShares = Seq("de", "en", "es", "fr", "zh").map(_ -> 0.2)
    val colShares = (0 until 20).map(i => s"src$i" -> 0.05)
    def inList(s: Seq[(String, Double)]) = s.map(x => s"'${x._1}'").mkString(", ")
    def caseOf(axis: String, s: Seq[(String, Double)]) =
      s"CASE $axis " + s.map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ") + " END"
    def rescale(prev: String, out: String, axis: String, s: Seq[(String, Double)]) =
      s"""$out AS (SELECT r, c, n, tot,
           CAST(CAST(floor(${caseOf(axis, s)} * CAST(tot AS DOUBLE)
               / CAST(CAST(sum(CAST(w * n AS DECIMAL(38,9))) OVER (PARTITION BY $axis)
                      AS DECIMAL(38,9)) AS DOUBLE)
               * CAST(w AS DOUBLE) * 1000000000.0 + 0.5) AS DOUBLE)
             / 1000000000.0 AS DECIMAL(18,9)) AS w
         FROM $prev)"""
    val iters = (1 to 3).flatMap { i =>
      Seq(rescale(if (i == 1) "g0" else s"c${i - 1}", s"r$i", "r", rowShares),
        rescale(s"r$i", s"c$i", "c", colShares))
    }.mkString(",\n      ")
    s"""
      WITH grid AS (SELECT lang AS r, source AS c, CAST(count(*) AS BIGINT) AS n
                    FROM documents
                    WHERE lang IN (${inList(rowShares)})
                      AND source IN (${inList(colShares)})
                    GROUP BY 1, 2),
      g0 AS (SELECT r, c, n, CAST(sum(n) OVER () AS BIGINT) AS tot,
                    CAST(1.0 AS DECIMAL(18,9)) AS w
             FROM grid),
      $iters
      SELECT r AS lang, c AS source, n, CAST(w AS DOUBLE) AS weight
      FROM c3 ORDER BY lang, source"""
  }

  /** The q93 2-iteration k-means CTE chain (lowest-id init, cosine
    * assignment with DESC-similarity/lowest-cid ties, per-dim float
    * means), ending at `c2 (cid, cv)` — shared by the q93 training gate
    * and the q249 silhouette so both score the SAME model. */
  private def kmeansCtes: String = """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      dims AS (SELECT unnest(range(1, 65)) AS i),
      c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
             FROM e ORDER BY vec_id LIMIT 4),
      a1 AS (SELECT vec_id, cid FROM (
               SELECT e.vec_id, c.cid,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
               FROM e CROSS JOIN c0 c) WHERE rn = 1),
      m1 AS (SELECT a.cid, d.i, avg(e.v[d.i]) AS x
             FROM a1 a JOIN e USING (vec_id) CROSS JOIN dims d GROUP BY a.cid, d.i),
      c1 AS (SELECT c0.cid, coalesce(mm.cv, c0.cv) AS cv
             FROM c0 LEFT JOIN (SELECT cid, list(x ORDER BY i) AS cv
                                FROM m1 GROUP BY cid) mm USING (cid)),
      a2 AS (SELECT vec_id, cid FROM (
               SELECT e.vec_id, c.cid,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
               FROM e CROSS JOIN c1 c) WHERE rn = 1),
      m2 AS (SELECT a.cid, d.i, avg(e.v[d.i]) AS x
             FROM a2 a JOIN e USING (vec_id) CROSS JOIN dims d GROUP BY a.cid, d.i),
      c2 AS (SELECT c1.cid, coalesce(mm.cv, c1.cv) AS cv
             FROM c1 LEFT JOIN (SELECT cid, list(x ORDER BY i) AS cv
                                FROM m2 GROUP BY cid) mm USING (cid))"""

  /** q249's oracle: the shared k-means chain, centroids floor-quantized
    * to the 1e-4 grid (the operator's model-card contract), cosine
    * rank-1/rank-2 dissimilarities, per-point 1e-6 silhouettes summed as
    * decimal. */
  private def silhouetteOracle: String = s"""
      WITH $kmeansCtes,
      cq AS (SELECT cid,
                    [CAST(floor(x * 10000.0 + 0.5) AS DOUBLE) / 10000.0 for x in cv]
                      AS cv
             FROM c2),
      sims AS (SELECT e.vec_id, c.cid, list_cosine_similarity(e.v, c.cv) AS sim
               FROM e CROSS JOIN cq c
               WHERE list_dot_product(e.v, e.v) > 0.0),
      ranked AS (SELECT vec_id, cid, sim,
                        row_number() OVER (PARTITION BY vec_id
                          ORDER BY sim DESC, cid) AS rn
                 FROM sims),
      ab AS (SELECT r1.vec_id, r1.cid, 1.0 - r1.sim AS a, 1.0 - r2.sim AS b
             FROM ranked r1 JOIN ranked r2
               ON r1.vec_id = r2.vec_id AND r2.rn = 2
             WHERE r1.rn = 1),
      sil AS (SELECT cid,
                     CAST(CAST(floor((CASE WHEN greatest(a, b) > 0.0
                                           THEN (b - a) / greatest(a, b)
                                           ELSE 0.0 END)
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
                       AS DECIMAL(18,6)) AS s
              FROM ab)
      SELECT cid, CAST(count(*) AS BIGINT) AS n,
             CAST(floor(CAST(CAST(sum(s) AS DECIMAL(38,6)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS mean_sil
      FROM sil GROUP BY cid ORDER BY cid"""

  /** q251's oracle: the q235 permutation machinery keyed by event_type
    * (same arm boundary, same per-(unit, rep) coin, each group's own
    * n_a share), then the BH step-up as a suffix-min over the 5-row
    * battery. */
  private def fdrSegmentsOracle: String = {
    val b = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val hArm = duckKeyHash("user_id", "exp1")
    val hPerm = duckKeyHash("id || ':' || CAST(pb AS VARCHAR)", "perm1")
    s"""
      WITH u0 AS (SELECT event_type AS g, user_id, count(*) AS v
                  FROM events GROUP BY 1, 2),
      base AS (SELECT g, CAST(user_id AS VARCHAR) AS id,
                      CASE WHEN $hArm < $b THEN 'a' ELSE 'b' END AS arm,
                      CAST(v AS BIGINT) AS v
               FROM u0),
      obs AS (SELECT g,
                     CAST(count(*) FILTER (WHERE arm = 'a') AS BIGINT) AS na,
                     CAST(count(*) FILTER (WHERE arm = 'b') AS BIGINT) AS nb,
                     CAST(coalesce(sum(v) FILTER (WHERE arm = 'a'), 0) AS BIGINT) AS sa,
                     CAST(coalesce(sum(v) FILTER (WHERE arm = 'b'), 0) AS BIGINT) AS sb
              FROM base GROUP BY g),
      ex AS (SELECT g, id, v, pb FROM base
             CROSS JOIN (SELECT unnest(range(1, 101)) AS pb)),
      pu AS (SELECT ex.g, ex.v, ex.pb,
                    ((CAST($hPerm AS DOUBLE) + 0.5) / 1152921504606846976.0)
                      < (CAST(obs.na AS DOUBLE)
                         / CAST(obs.na + obs.nb AS DOUBLE)) AS pa
             FROM ex JOIN obs ON ex.g = obs.g),
      pg AS (SELECT g, pb,
                    CAST(coalesce(sum(v) FILTER (WHERE pa), 0) AS BIGINT) AS psa,
                    CAST(coalesce(sum(v) FILTER (WHERE NOT pa), 0) AS BIGINT) AS psb,
                    count(*) FILTER (WHERE pa) AS pna,
                    count(*) FILTER (WHERE NOT pa) AS pnb
             FROM pu GROUP BY g, pb),
      pd AS (SELECT g, CAST(psb AS DOUBLE) / CAST(pnb AS DOUBLE)
                      - CAST(psa AS DOUBLE) / CAST(pna AS DOUBLE) AS pdiff
             FROM pg WHERE pna > 0 AND pnb > 0),
      agg AS (SELECT pd.g, count(*) AS used,
                     count(*) FILTER (WHERE abs(pdiff) >=
                       abs(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
                           - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))) AS ge
              FROM pd JOIN obs ON pd.g = obs.g GROUP BY pd.g),
      tests AS (SELECT obs.g AS event_type, obs.na AS n_a, obs.nb AS n_b,
                       CASE WHEN obs.na > 0 AND obs.nb > 0
                            THEN CAST(floor((CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
                                   - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
                                   * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
                       END AS diff_obs,
                       CAST(coalesce(agg.used, 0) AS BIGINT) AS reps,
                       CASE WHEN obs.na > 0 AND obs.nb > 0 AND agg.used IS NOT NULL
                            THEN CAST(floor(CAST(agg.ge + 1 AS DOUBLE)
                                   / CAST(agg.used + 1 AS DOUBLE)
                                   * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
                       END AS p_value
                FROM obs LEFT JOIN agg ON obs.g = agg.g),
      ranked AS (SELECT *,
                        CAST(count(*) OVER () AS BIGINT) AS m,
                        CAST(row_number() OVER (ORDER BY p_value, event_type)
                          AS BIGINT) AS rank
                 FROM tests WHERE p_value IS NOT NULL),
      adj AS (SELECT *,
                     CAST(floor(least(1.0,
                         min(p_value * CAST(m AS DOUBLE) / CAST(rank AS DOUBLE))
                           OVER (ORDER BY rank
                                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS p_adj
              FROM ranked)
      SELECT event_type, n_a, n_b, diff_obs, reps, p_value, m, rank, p_adj,
             (p_adj <= 0.1) AS reject
      FROM adj ORDER BY event_type"""
  }

  /** The q203 hashed-linear quality-score CTE chain (sigmoid over the
    * md5-bucketed token weights, rounded to 1e-4), ending at
    * `sc (doc_id, lang, s)` — shared by the reliability card and the
    * q255 Brier decomposition so both gates score the SAME model. */
  private def qualityScoreCtes: String =
    s"""toks AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
      wv AS (SELECT [${qualityWeights.mkString(", ")}] AS wl),
      sc AS (SELECT doc_id, lang,
               round(1.0 / (1.0 + exp(-(
                 list_reduce(
                   list_prepend(CAST(-0.5 AS DOUBLE),
                     list_transform(w, t -> wl[
                       CAST(CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) % 64 AS INTEGER) + 1])),
                   (acc, x) -> acc + x)))), 4) AS s
             FROM toks CROSS JOIN wv)"""

  /** q255's oracle: the shared score chain, reliabilityCard's 1e-7 snap
    * and clamped binning, per-row/per-bin terms 1e-9-quantized then
    * decimal-summed — the operator's Murphy decomposition verbatim. */
  private def brierOracle: String = s"""
      WITH $qualityScoreCtes,
      b AS (SELECT least(greatest(CAST(floor(s * 10) AS BIGINT), 0), 9) AS bin,
                   CAST(floor(s * 10000000.0 + 0.5) AS BIGINT) AS c7,
                   CAST(CAST(floor(s * 10000000.0 + 0.5) AS BIGINT) AS DOUBLE)
                     / 10000000.0 AS p,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM sc),
      pb AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(c7) AS BIGINT) AS s7,
                    CAST(sum(y) AS BIGINT) AS pos,
                    CAST(sum(CAST(CAST(floor((p - y) * (p - y) * 1000000000.0 + 0.5)
                        AS DOUBLE) / 1000000000.0 AS DECIMAL(18,9)))
                      AS DECIMAL(38,9)) AS ssq
             FROM b GROUP BY bin),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS gpos,
                     CAST(sum(ssq) AS DECIMAL(38,9)) AS gssq
              FROM pb),
      bt AS (SELECT
               CAST(sum(CAST(CAST(floor(CAST(pb.n AS DOUBLE)
                     * (CAST(s7 AS DOUBLE) / 10000000.0 / CAST(pb.n AS DOUBLE)
                        - CAST(pos AS DOUBLE) / CAST(pb.n AS DOUBLE))
                     * (CAST(s7 AS DOUBLE) / 10000000.0 / CAST(pb.n AS DOUBLE)
                        - CAST(pos AS DOUBLE) / CAST(pb.n AS DOUBLE))
                     * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0
                   AS DECIMAL(18,9))) AS DECIMAL(38,9)) AS srel,
               CAST(sum(CAST(CAST(floor(CAST(pb.n AS DOUBLE)
                     * (CAST(pos AS DOUBLE) / CAST(pb.n AS DOUBLE)
                        - CAST(gpos AS DOUBLE) / CAST(tot.n AS DOUBLE))
                     * (CAST(pos AS DOUBLE) / CAST(pb.n AS DOUBLE)
                        - CAST(gpos AS DOUBLE) / CAST(tot.n AS DOUBLE))
                     * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0
                   AS DECIMAL(18,9))) AS DECIMAL(38,9)) AS sres
             FROM pb CROSS JOIN tot)
      SELECT tot.n,
             CAST(floor(CAST(gpos AS DOUBLE) / CAST(tot.n AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS base_rate,
             CAST(floor(CAST(gssq AS DOUBLE) / CAST(tot.n AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS brier,
             CAST(floor(CAST(srel AS DOUBLE) / CAST(tot.n AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS reliability,
             CAST(floor(CAST(sres AS DOUBLE) / CAST(tot.n AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS resolution,
             CAST(floor(CAST(gpos AS DOUBLE) / CAST(tot.n AS DOUBLE)
                 * (1.0 - CAST(gpos AS DOUBLE) / CAST(tot.n AS DOUBLE))
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS uncertainty
      FROM tot CROSS JOIN bt"""

  /** q256's oracle: the shared score chain + the PAV minimax closed form
    * `iso(i) = max_{j≤i} min_{k≥i} mean(y, j..k)` — every mean one
    * exact-integer division off cumulative prefixes, B³ enumeration on
    * the bins-sized grid. */
  /** The q256 PAV chain (binning → cumulative prefixes → minimax),
    * ending at `iso (bin, iso)` over `cum (bin, n, pos, …)` — shared by
    * the isotonic gate and the q257 calibrated-Brier composition. */
  private def isotonicCtes: String = """b AS (SELECT least(greatest(CAST(floor(s * 10) AS BIGINT), 0), 9) AS bin,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM sc),
      bb AS (SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
             FROM b GROUP BY bin),
      cum AS (SELECT bin, n, pos,
                     CAST(sum(n) OVER wc AS BIGINT) AS cn,
                     CAST(sum(pos) OVER wc AS BIGINT) AS cp
              FROM bb
              WINDOW wc AS (ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      jk AS (SELECT j.bin AS j, k.bin AS k,
                    CAST(k.cp - (j.cp - j.pos) AS DOUBLE)
                      / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS m
             FROM cum j JOIN cum k ON j.bin <= k.bin),
      mn2 AS (SELECT i.bin, jk.j, min(jk.m) AS mm
              FROM cum i JOIN jk ON jk.j <= i.bin AND jk.k >= i.bin
              GROUP BY i.bin, jk.j),
      iso AS (SELECT bin, max(mm) AS iso FROM mn2 GROUP BY bin)"""

  private def isotonicOracle: String = s"""
      WITH $qualityScoreCtes,
      $isotonicCtes
      SELECT cum.bin, cum.n,
             CAST(floor(CAST(pos AS DOUBLE) / CAST(cum.n AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS frac_pos,
             CAST(floor(iso.iso * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS iso
      FROM cum JOIN iso USING (bin) ORDER BY bin"""

  /** q257's oracle: the raw leg IS q255's oracle as a derived table; the
    * calibrated leg reuses the shared PAV chain and computes per-bin
    * Σ(p−y)² in closed form with iso first snapped to the operator
    * output's 1e-6 grid. */
  private def calibratedBrierOracle: String = s"""
      WITH $qualityScoreCtes,
      $isotonicCtes,
      ct AS (SELECT cum.n,
                    CAST(CAST(floor((CAST(cum.n AS DOUBLE)
                          * (CAST(floor(iso.iso * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0)
                          * (CAST(floor(iso.iso * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0)
                        - 2.0 * (CAST(floor(iso.iso * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0)
                          * CAST(cum.pos AS DOUBLE)
                        + CAST(cum.pos AS DOUBLE))
                        * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0
                      AS DECIMAL(18,9)) AS t
             FROM cum JOIN iso USING (bin)),
      cal AS (SELECT CAST(floor(CAST(CAST(sum(t) AS DECIMAL(38,9)) AS DOUBLE)
                  / CAST(sum(n) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
                / 1000000.0 AS brier_cal
              FROM ct)
      SELECT r.n, r.brier AS brier_raw, r.reliability AS reliability_raw,
             cal.brier_cal
      FROM ($brierOracle) r CROSS JOIN cal"""

  /** q258's oracle: the shared score chain + the hashSplit hash as a
    * boolean train flag, ONE (tr, bin) stats CTE (counts, positives, and
    * the 1e-9-quantized decimal raw-Brier sums), the q256 PAV chain over
    * the TRAIN rows only, iso snapped to the published 1e-6 grid, and the
    * held-out side's calibrated sum in closed form with identity fallback
    * for bins the train map never saw. */
  private def oosCalibrationOracle: String = {
    val bnd = Sampling.splitBoundaries(Seq("train" -> 0.5, "test" -> 0.5)).head._2
    val h = duckKeyHash("doc_id", "cal1")
    s"""
      WITH $qualityScoreCtes,
      b AS (SELECT least(greatest(CAST(floor(s * 10) AS BIGINT), 0), 9) AS bin,
                   CAST(CAST(floor(s * 10000000.0 + 0.5) AS BIGINT) AS DOUBLE)
                     / 10000000.0 AS p,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                   ($h < $bnd) AS tr
            FROM sc),
      st AS (SELECT tr, bin, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(y) AS BIGINT) AS pos,
                    CAST(sum(CAST(CAST(floor((p - y) * (p - y) * 1000000000.0 + 0.5)
                        AS DOUBLE) / 1000000000.0 AS DECIMAL(18,9)))
                      AS DECIMAL(38,9)) AS ssq
             FROM b GROUP BY tr, bin),
      tb AS (SELECT bin, n, pos FROM st WHERE tr),
      cum AS (SELECT bin, n, pos,
                     CAST(sum(n) OVER wc AS BIGINT) AS cn,
                     CAST(sum(pos) OVER wc AS BIGINT) AS cp
              FROM tb
              WINDOW wc AS (ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      jk AS (SELECT j.bin AS j, k.bin AS k,
                    CAST(k.cp - (j.cp - j.pos) AS DOUBLE)
                      / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS m
             FROM cum j JOIN cum k ON j.bin <= k.bin),
      mn2 AS (SELECT i.bin, jk.j, min(jk.m) AS mm
              FROM cum i JOIN jk ON jk.j <= i.bin AND jk.k >= i.bin
              GROUP BY i.bin, jk.j),
      iso AS (SELECT bin, CAST(floor(max(mm) * 1000000.0 + 0.5) AS DOUBLE)
                            / 1000000.0 AS iso
              FROM mn2 GROUP BY bin),
      ntr AS (SELECT coalesce(CAST(sum(n) AS BIGINT), CAST(0 AS BIGINT)) AS n_train
              FROM tb),
      te AS (SELECT st.n, st.pos, st.ssq, iso.iso
             FROM st LEFT JOIN iso USING (bin) WHERE NOT tr),
      ct AS (SELECT n, ssq,
                    CASE WHEN iso IS NOT NULL
                      THEN CAST(CAST(floor((CAST(n AS DOUBLE) * iso * iso
                             - 2.0 * iso * CAST(pos AS DOUBLE)
                             + CAST(pos AS DOUBLE))
                           * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0
                         AS DECIMAL(38,9))
                      ELSE ssq END AS cal
             FROM te),
      ag AS (SELECT CAST(sum(n) AS BIGINT) AS n_test,
                    CAST(sum(ssq) AS DECIMAL(38,9)) AS sraw,
                    CAST(sum(cal) AS DECIMAL(38,9)) AS scal
             FROM ct)
      SELECT ntr.n_train, ag.n_test,
             CAST(floor(CAST(sraw AS DOUBLE) / CAST(n_test AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS brier_raw,
             CAST(floor(CAST(scal AS DOUBLE) / CAST(n_test AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS brier_cal
      FROM ag CROSS JOIN ntr"""
  }

  /** q253's oracle: q227's subject derivation + the hashSplit arm, then
    * the Mantel–Cox machinery — exact integer at-risk windows,
    * 1e-9-quantized O−E and V terms decimal-summed. */
  private def logRankOracle: String = {
    val b = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val h = duckKeyHash("user_id", "exp1")
    s"""
      WITH ev AS (SELECT user_id, event_type, CAST(ts AS DATE) AS dt FROM events
                  WHERE CAST(ts AS DATE) <= DATE '2024-01-03'),
      f AS (SELECT user_id, min(dt) AS start FROM ev GROUP BY user_id),
      p AS (SELECT user_id, min(dt) AS pd FROM ev WHERE event_type = 'purchase'
            GROUP BY user_id),
      subj AS (SELECT f.user_id,
                      CASE WHEN pd IS NOT NULL THEN date_diff('day', start, pd)
                           ELSE date_diff('day', start, DATE '2024-01-03') END AS t,
                      (pd IS NOT NULL) AS o
               FROM f LEFT JOIN p USING (user_id)),
      armed AS (SELECT (CASE WHEN $h < $b THEN TRUE ELSE FALSE END) AS ga, t, o
                FROM subj),
      pt AS (SELECT t,
                    CAST(count(*) FILTER (WHERE ga) AS BIGINT) AS xa,
                    CAST(count(*) FILTER (WHERE NOT ga) AS BIGINT) AS xb,
                    CAST(count(*) FILTER (WHERE ga AND o) AS BIGINT) AS da,
                    CAST(count(*) FILTER (WHERE NOT ga AND o) AS BIGINT) AS db
             FROM armed GROUP BY t),
      tot AS (SELECT CAST(count(*) FILTER (WHERE ga) AS BIGINT) AS n_a,
                     CAST(count(*) FILTER (WHERE NOT ga) AS BIGINT) AS n_b,
                     CAST(count(*) FILTER (WHERE ga AND o) AS BIGINT) AS events_a,
                     CAST(count(*) FILTER (WHERE NOT ga AND o) AS BIGINT) AS events_b
              FROM armed),
      w AS (SELECT pt.t, pt.da, pt.db,
                   n_a - coalesce(sum(xa) OVER wb, 0) AS ra,
                   n_b - coalesce(sum(xb) OVER wb, 0) AS rb
            FROM pt CROSS JOIN tot
            WINDOW wb AS (ORDER BY pt.t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      terms AS (SELECT
                  CAST(CAST(floor((CAST(da AS DOUBLE)
                        - (CAST(da AS DOUBLE) + CAST(db AS DOUBLE))
                          * CAST(ra AS DOUBLE)
                          / (CAST(ra AS DOUBLE) + CAST(rb AS DOUBLE)))
                      * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0
                    AS DECIMAL(18,9)) AS ome,
                  CAST(CAST(floor((CASE WHEN CAST(ra AS DOUBLE) + CAST(rb AS DOUBLE) > 1.0
                        THEN (CAST(da AS DOUBLE) + CAST(db AS DOUBLE))
                          * (CAST(ra AS DOUBLE)
                             / (CAST(ra AS DOUBLE) + CAST(rb AS DOUBLE)))
                          * (1.0 - CAST(ra AS DOUBLE)
                             / (CAST(ra AS DOUBLE) + CAST(rb AS DOUBLE)))
                          * (CAST(ra AS DOUBLE) + CAST(rb AS DOUBLE)
                             - (CAST(da AS DOUBLE) + CAST(db AS DOUBLE)))
                          / (CAST(ra AS DOUBLE) + CAST(rb AS DOUBLE) - 1.0)
                        ELSE 0.0 END)
                      * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0
                    AS DECIMAL(18,9)) AS v
                FROM w WHERE da + db >= 1),
      s AS (SELECT CAST(sum(ome) AS DECIMAL(38,9)) AS osum,
                   CAST(sum(v) AS DECIMAL(38,9)) AS sv
            FROM terms)
      SELECT n_a, n_b, events_a, events_b,
             CAST(floor(CAST(coalesce(osum, CAST(0 AS DECIMAL(38,9))) AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS o_minus_e_a,
             CAST(floor(CAST(coalesce(sv, CAST(0 AS DECIMAL(38,9))) AS DOUBLE)
                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS var_sum,
             CASE WHEN coalesce(sv, CAST(0 AS DECIMAL(38,9))) > 0
                  THEN CAST(floor(CAST(osum AS DOUBLE) * CAST(osum AS DOUBLE)
                         / CAST(sv AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
                    / 1000000.0
             END AS chi2
      FROM tot CROSS JOIN s"""
  }

  /** q252's oracle: q174's histogram-quantile machinery grouped by the
    * hashSplit arm, then the a/b pivot and the exact-grid difference. */
  private def qteOracle: String = {
    val b = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val h = duckKeyHash("user_id", "exp1")
    s"""
      WITH u AS (SELECT user_id, count(*) AS v FROM events GROUP BY user_id),
      asg AS (SELECT CASE WHEN $h < $b THEN 'a' ELSE 'b' END AS split, v FROM u),
      h AS (SELECT split,
                   ((greatest(CAST(0 AS BIGINT), least(CAST(1023 AS BIGINT),
                       CAST(v AS BIGINT)))) * 256) // 1024 AS bin,
                   count(*) AS cnt
            FROM asg GROUP BY split, bin),
      c AS (SELECT split, bin, cnt,
                   sum(cnt) OVER (PARTITION BY split ORDER BY bin
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum,
                   sum(cnt) OVER (PARTITION BY split) AS n
            FROM h),
      qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                            CAST(0.99 AS DOUBLE)]) AS q),
      hit AS (SELECT c.split, qs.q, c.bin, c.cnt,
                     qs.q * c.n AS target, c.cum - c.cnt AS before
              FROM c CROSS JOIN qs
              WHERE c.cum >= qs.q * c.n AND c.cum - c.cnt < qs.q * c.n),
      est AS (SELECT split, q,
                     CAST(floor((0 + (bin + (target - before) / cnt)
                           * (CAST(1024 AS DOUBLE) / 256))
                         * 10000.0 + 0.5) AS DOUBLE) / 10000.0 AS est
              FROM hit)
      SELECT a.q, a.est AS est_a, b.est AS est_b,
             CAST(floor((b.est - a.est) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS qte
      FROM est a JOIN est b ON a.q = b.q
      WHERE a.split = 'a' AND b.split = 'b'
      ORDER BY a.q"""
  }

  /** q248's oracle: the three single-row oracles (q230/q237/q235) as
    * CTE-bearing derived tables crossJoined — composition reuses the
    * EXACT per-leg SQL, so a scorecard divergence isolates to a leg. */
  private def scorecardOracle: String =
    s"""
      SELECT ab.n_a, ab.n_b, ab.rate_a, ab.rate_b, ab.lift, ab.z_conv,
             ab.z_srm, ab.srm_flag,
             w.mean_a AS mean_eng_a, w.mean_b AS mean_eng_b,
             w.t_stat AS welch_t, w.df_welch,
             p.p_value AS perm_p
      FROM ($abReadoutOracle) ab
      CROSS JOIN ($welchOracle) w
      CROSS JOIN ($permutationOracle) p"""

  /** q235's oracle: the hashSplit arm boundary + the permutation coin on
    * the same salted grid, mirrored end to end. */
  private def permutationOracle: String = {
    val b = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val hArm = duckKeyHash("user_id", "exp1")
    val hPerm = duckKeyHash("id || ':' || CAST(pb AS VARCHAR)", "perm1")
    s"""
      WITH u0 AS (SELECT user_id, count(*) AS v FROM events GROUP BY user_id),
      base AS (SELECT CAST(user_id AS VARCHAR) AS id,
                      CASE WHEN $hArm < $b THEN 'a' ELSE 'b' END AS arm,
                      CAST(v AS BIGINT) AS v
               FROM u0),
      obs AS (SELECT CAST(count(*) FILTER (WHERE arm = 'a') AS BIGINT) AS na,
                     CAST(count(*) FILTER (WHERE arm = 'b') AS BIGINT) AS nb,
                     CAST(coalesce(sum(v) FILTER (WHERE arm = 'a'), 0) AS BIGINT) AS sa,
                     CAST(coalesce(sum(v) FILTER (WHERE arm = 'b'), 0) AS BIGINT) AS sb
              FROM base),
      ex AS (SELECT id, v, pb FROM base
             CROSS JOIN (SELECT unnest(range(1, 201)) AS pb)),
      pu AS (SELECT v, pb,
                    ((CAST($hPerm AS DOUBLE) + 0.5) / 1152921504606846976.0)
                      < (CAST(na AS DOUBLE) / CAST(na + nb AS DOUBLE)) AS pa
             FROM ex CROSS JOIN obs),
      pg AS (SELECT pb,
                    CAST(coalesce(sum(v) FILTER (WHERE pa), 0) AS BIGINT) AS psa,
                    CAST(coalesce(sum(v) FILTER (WHERE NOT pa), 0) AS BIGINT) AS psb,
                    count(*) FILTER (WHERE pa) AS pna,
                    count(*) FILTER (WHERE NOT pa) AS pnb
             FROM pu GROUP BY pb),
      pd AS (SELECT CAST(psb AS DOUBLE) / CAST(pnb AS DOUBLE)
                      - CAST(psa AS DOUBLE) / CAST(pna AS DOUBLE) AS pdiff
             FROM pg WHERE pna > 0 AND pnb > 0),
      agg AS (SELECT count(*) AS used,
                     count(*) FILTER (WHERE abs(pdiff) >=
                       abs(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
                           - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))) AS ge
              FROM pd CROSS JOIN obs)
      SELECT na AS n_a, nb AS n_b,
             CAST(floor(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS mean_a,
             CAST(floor(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS mean_b,
             CAST(floor((CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)
                         - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS diff_obs,
             CAST(used AS BIGINT) AS reps,
             CAST(floor(CAST(ge + 1 AS DOUBLE) / CAST(used + 1 AS DOUBLE)
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS p_value
      FROM obs CROSS JOIN agg"""
  }

  /** q92's weight vector, shared verbatim between the Spark call and the
    * oracle's list literal so both engines fold the SAME doubles. */
  // package-visible so ScaleSmoke can drive the SAME scorer it gates
  private[graft] val qualityWeights: Seq[Double] =
    (0 until 64).map(i => ((i * 37) % 21 - 10) / 10.0)

  private def clusterSplitOracle: String = {
    val whens = Sampling
      .splitBoundaries(Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .map { case (label, b) => s"WHEN ${duckKeyHash("cc.cluster_id", "csp")} < $b THEN '$label'" }
      .mkString(" ")
    s"""
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
      cc AS (SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id)
      SELECT cc.doc_id, CASE $whens ELSE 'test' END AS split
      FROM cc ORDER BY cc.doc_id"""
  }

  private def spanCorruptionOracle: String = {
    val thr = Sampling.threshold(0.08)
    // positions are 1-based; list_slice is INCLUSIVE-end in DuckDB, so the
    // span window at p is list_slice(s, greatest(p-2, 1), p) for L=3 —
    // matching Spark's slice(start, p - start + 1)
    s"""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      st AS (SELECT doc_id, w,
               [CASE WHEN CAST(concat('0x', substring(md5(
                      'sc1' || CAST(doc_id AS VARCHAR) || '#' || CAST(p AS VARCHAR)), 1, 15))
                      AS BIGINT) < $thr THEN 1 ELSE 0 END
                for p in range(1, len(w) + 1)] AS s
             FROM toks),
      mk AS (SELECT doc_id, w,
               [CASE WHEN list_max(list_slice(s, greatest(p - 2, 1), p)) = 1
                     THEN 1 ELSE 0 END
                for p in range(1, len(s) + 1)] AS m
             FROM st),
      built AS (
        SELECT doc_id,
               coalesce(array_to_string(
                 [CASE WHEN m[p] = 0 THEN w[p] ELSE '<MASK>' END
                  for p in range(1, len(w) + 1)
                  if m[p] = 0 OR p = 1 OR m[p - 1] = 0], ' '), '') AS input,
               coalesce(array_to_string(
                 [CASE WHEN p = 1 OR m[p - 1] = 0 THEN '<SEP> ' || w[p] ELSE w[p] END
                  for p in range(1, len(w) + 1)
                  if m[p] = 1], ' '), '') AS tgt,
               list_sum(m) AS n_masked
        FROM mk)
      SELECT doc_id, input,
             CASE WHEN len(tgt) = 0 THEN '' ELSE substring(tgt, 7) END AS target,
             CAST(coalesce(n_masked, 0) AS INTEGER) AS n_masked
      FROM built ORDER BY doc_id"""
  }

  /** q128: per-column profile with the q110 HLL chain generated per column
    * (p=6 -> 64 buckets, 54 w-bits, rank base 55) — registers rebuilt
    * exactly, plus string-form min/max and null counts. */
  /** q209's oracle is GENERATED: the q128 HLL re-derivation runs once per
    * vintage (prefixed CTE blocks), then the same full-outer drift join. */
  private def profileDriftOracle: String = {
    def sideSql(cols: Seq[String], from: String, pre: String): String = {
      val hUnion = cols.map(c =>
        s"""SELECT '$c' AS "column",
               CAST(concat('0x', substring(md5('pd9' || CAST($c AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
            FROM $from AS src WHERE $c IS NOT NULL""").mkString(" UNION ALL ")
      val bUnion = cols.map(c =>
        s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls
            FROM $from AS src""").mkString(" UNION ALL ")
      s"""${pre}h AS ($hUnion),
        ${pre}basic AS ($bUnion),
        ${pre}parts AS (SELECT "column", hv >> 54 AS bucket, hv & ${(1L << 54) - 1} AS w FROM ${pre}h),
        ${pre}ranks AS (SELECT "column", bucket,
                CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END AS rank FROM ${pre}parts),
        ${pre}regs AS (SELECT "column", bucket, max(rank) AS reg FROM ${pre}ranks GROUP BY 1, 2),
        ${pre}agg AS (SELECT "column", sum(1::BIGINT << (55 - reg)) AS z_occ, count(*) AS occ
                FROM ${pre}regs GROUP BY 1),
        ${pre}est AS (SELECT "column",
                CAST(z_occ + (64 - occ) * (1::BIGINT << 55) AS DOUBLE) AS z,
                64 - occ AS zeros FROM ${pre}agg),
        ${pre}raws AS (SELECT "column", ${Sketches.hllAlpha(64) * 64 * 64} * ${(1L << 55).toDouble} / z AS raw, zeros
                 FROM ${pre}est),
        ${pre}prof AS (SELECT b."column", b.n_rows, b.n_nulls,
                round(CASE WHEN raw <= 160.0 AND zeros > 0
                           THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE)) ELSE raw END, 4) AS de
             FROM ${pre}basic b JOIN ${pre}raws USING ("column"))"""
    }
    val oldFrom = "(SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0)"
    val newFrom = "(SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN NULL ELSE lang END AS lang, source FROM documents WHERE doc_id % 2 = 1)"
    s"""
      WITH ${sideSql(Seq("doc_id", "lang", "n_chars"), oldFrom, "o")},
      ${sideSql(Seq("doc_id", "lang", "source"), newFrom, "nn")}
      SELECT "column",
             CASE WHEN o.n_rows IS NULL THEN 'added'
                  WHEN nn.n_rows IS NULL THEN 'removed'
                  ELSE 'common' END AS status,
             o.n_rows AS old_rows, nn.n_rows AS new_rows,
             CAST(floor((coalesce(CAST(nn.n_nulls AS DOUBLE) / CAST(nn.n_rows AS DOUBLE), 0.0)
                         - coalesce(CAST(o.n_nulls AS DOUBLE) / CAST(o.n_rows AS DOUBLE), 0.0))
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS null_frac_delta,
             CASE WHEN o.de > 0
                  THEN CAST(floor(nn.de / o.de * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS distinct_ratio
      FROM oprof o FULL OUTER JOIN nnprof nn USING ("column")
      ORDER BY "column""""
  }

  private def tableProfileOracle: String = {
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val hUnion = cols.map(c =>
      s"""SELECT '$c' AS "column",
                 CAST(concat('0x', substring(md5('prof9' || CAST($c AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
          FROM documents WHERE $c IS NOT NULL""").mkString("\n          UNION ALL\n")
    val bUnion = cols.map(c =>
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                 min(CAST($c AS VARCHAR)) AS min_str, max(CAST($c AS VARCHAR)) AS max_str
          FROM documents""").mkString("\n          UNION ALL\n")
    s"""
      WITH h AS ($hUnion),
      basic AS ($bUnion),
      parts AS (SELECT "column", hv >> 54 AS bucket, hv & ${(1L << 54) - 1} AS w FROM h),
      ranks AS (SELECT "column", bucket,
              CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END AS rank FROM parts),
      regs AS (SELECT "column", bucket, max(rank) AS reg FROM ranks GROUP BY 1, 2),
      agg AS (SELECT "column", sum(1::BIGINT << (55 - reg)) AS z_occ, count(*) AS occ
              FROM regs GROUP BY 1),
      est AS (SELECT "column",
              CAST(z_occ + (64 - occ) * (1::BIGINT << 55) AS DOUBLE) AS z,
              64 - occ AS zeros FROM agg),
      raws AS (SELECT "column", ${Sketches.hllAlpha(64) * 64 * 64} * ${(1L << 55).toDouble} / z AS raw, zeros
               FROM est)
      SELECT b."column", b.n_rows, b.n_nulls, b.min_str, b.max_str,
             round(CASE WHEN raw <= 160.0 AND zeros > 0
                        THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE)) ELSE raw END, 4) AS distinct_est,
             CAST(zeros AS INTEGER) AS zero_regs
      FROM basic b JOIN raws USING ("column") ORDER BY b."column""""
  }

  private def sampleQuantilesOracle: String =
    s"""WITH s AS (SELECT n_chars FROM documents
                   ORDER BY ${duckKeyHash("doc_id", "bk1")}, doc_id LIMIT 100),
        l AS (SELECT list(n_chars ORDER BY n_chars) AS ls, count(*) AS n FROM s),
        qs AS (SELECT unnest([0.1, 0.5, 0.9, 0.99]) AS quantile)
        SELECT quantile, ls[CAST(floor(quantile * (n - 1)) AS INTEGER) + 1] AS value
        FROM qs CROSS JOIN l ORDER BY quantile"""

  private def groupSampleOracle: String =
    s"""SELECT doc_id, lang FROM (
          SELECT doc_id, lang,
                 rank() OVER (PARTITION BY lang
                              ORDER BY ${duckKeyHash("doc_id", "gs1")}) AS r
          FROM documents)
        WHERE r <= 20 ORDER BY doc_id"""

  private def bottomKSampleOracle: String =
    s"""SELECT doc_id FROM (
          SELECT doc_id FROM documents
          ORDER BY ${duckKeyHash("doc_id", "bk1")}, doc_id LIMIT 100)
        ORDER BY doc_id"""

  private def hashSampleOracle: String =
    s"""SELECT doc_id, text FROM documents
        WHERE ${duckKeyHash("doc_id", "s1")} < ${Sampling.threshold(0.2)}
        ORDER BY doc_id"""

  /** q190's oracle: the SAME salted hash gate applied independently to each
    * table's user key — coordination is a property of the predicate, not
    * of any shared state, which is exactly what the query demonstrates. */
  private def coordinatedSampleOracle: String =
    s"""
      WITH ev AS (SELECT user_id, count(*) AS n_events FROM events
                  WHERE ${duckKeyHash("user_id", "coord")} < ${Sampling.threshold(0.1)}
                  GROUP BY user_id),
      ord AS (SELECT o_custkey AS user_id, count(*) AS n_orders FROM orders
              WHERE ${duckKeyHash("o_custkey", "coord")} < ${Sampling.threshold(0.1)}
              GROUP BY o_custkey)
      SELECT coalesce(ev.user_id, ord.user_id) AS user_id,
             CAST(coalesce(ev.n_events, 0) AS BIGINT) AS n_events,
             CAST(coalesce(ord.n_orders, 0) AS BIGINT) AS n_orders
      FROM ev FULL OUTER JOIN ord ON ev.user_id = ord.user_id
      ORDER BY user_id"""

  private def hashSplitOracle: String = {
    // identical cumulative boundaries as the implementation (shared float
    // accumulation — see Sampling.splitBoundaries)
    val whens = Sampling
      .splitBoundaries(Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .map { case (label, b) => s"WHEN ${duckKeyHash("doc_id", "sp")} < $b THEN '$label'" }
      .mkString(" ")
    s"""SELECT doc_id, CASE $whens ELSE 'test' END AS split
        FROM documents ORDER BY doc_id"""
  }

  private def stratifiedSampleOracle: String =
    s"""SELECT event_id, event_type FROM events
        WHERE ${duckKeyHash("event_id", "st")} <
              CASE event_type WHEN 'error' THEN ${Sampling.threshold(0.05)}
                              WHEN 'purchase' THEN ${Sampling.threshold(1.0)}
                              WHEN 'click' THEN ${Sampling.threshold(0.25)}
                              ELSE ${Sampling.threshold(0.5)} END
        ORDER BY event_id"""

  private def mixCorporaOracle: String =
    s"""SELECT doc_id, source FROM (
          SELECT doc_id, 'even' AS source FROM documents
          WHERE doc_id % 2 = 0
            AND ${duckKeyHash("doc_id", "mx/even")} < ${Sampling.threshold(0.5)}
          UNION ALL
          SELECT doc_id, 'odd' AS source FROM documents
          WHERE doc_id % 2 = 1
            AND ${duckKeyHash("doc_id", "mx/odd")} < ${Sampling.threshold(0.25)})
        ORDER BY doc_id"""

  /** Same chunk geometry as the q56 Spark side: stride 24, window 32,
    * last start = the largest stride multiple strictly below len. */
  private def chunkingOracle: String = {
    val (chunk, stride) = (32, 24)
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        st AS (
          SELECT doc_id, w, len(w) AS n,
                 unnest(range(0, greatest(0, (len(w) - ${chunk - stride} - 1) // $stride) * $stride + 1, $stride)) AS s
          FROM toks)
        SELECT doc_id,
               CAST(s // $stride AS INTEGER) AS chunk_idx,
               CAST(greatest(0, (n - ${chunk - stride} - 1) // $stride) + 1 AS INTEGER) AS n_chunks,
               CAST(least(s + $chunk, n) - s AS INTEGER) AS chunk_tokens,
               array_to_string(list_slice(w, s + 1, least(s + $chunk, n)), ' ') AS chunk
        FROM st ORDER BY doc_id, chunk_idx"""
  }

  /** q60: the q56 chunk geometry, then ONE global running token total
    * (exclusive) and integer division by the pack capacity — the serial
    * definition the distributed two-phase prefix sum must reproduce. */
  private def packingOracle: String = {
    val (chunk, stride, capacity) = (32, 24, 512)
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        st AS (
          SELECT doc_id, w, len(w) AS n,
                 unnest(range(0, greatest(0, (len(w) - ${chunk - stride} - 1) // $stride) * $stride + 1, $stride)) AS s
          FROM toks),
        ch AS (
          SELECT doc_id,
                 CAST(s // $stride AS INTEGER) AS chunk_idx,
                 CAST(least(s + $chunk, n) - s AS INTEGER) AS chunk_tokens
          FROM st),
        cum AS (
          SELECT doc_id, chunk_idx, chunk_tokens,
                 sum(chunk_tokens) OVER (ORDER BY doc_id, chunk_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - chunk_tokens AS prev
          FROM ch)
        SELECT doc_id, chunk_idx, chunk_tokens,
               CAST(prev // $capacity AS BIGINT) AS pack_id
        FROM cum ORDER BY doc_id, chunk_idx"""
  }

  /** Same planted PII and the same RE2-compatible patterns as q57's Spark
    * side; DuckDB needs the explicit 'g' flag for replace-all. */
  private def piiOracle: String = {
    val email = graft.operators.TextAnalysis.EmailPattern
    val ip = graft.operators.TextAnalysis.Ipv4Pattern
    val phone = graft.operators.TextAnalysis.PhonePattern
    s"""WITH aug AS (
          SELECT doc_id,
                 text || ' contact user' || doc_id || '@example.com at 10.0.' ||
                 (doc_id % 256) || '.7 or 555-' ||
                 lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-1234' AS text
          FROM documents)
        , staged AS (
          SELECT doc_id, text,
                 regexp_replace(text, '$email', '<EMAIL>', 'g') AS after_email
          FROM aug),
        staged2 AS (
          SELECT doc_id, text, after_email,
                 regexp_replace(after_email, '$phone', '<PHONE>', 'g') AS after_phone
          FROM staged)
        SELECT doc_id,
               regexp_replace(after_phone, '$ip', '<IP>', 'g') AS redacted,
               CAST(len(regexp_extract_all(text, '$email')) AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(after_phone, '$ip')) AS INTEGER) AS n_ips,
               CAST(len(regexp_extract_all(after_email, '$phone')) AS INTEGER) AS n_phones
        FROM staged2 ORDER BY doc_id"""
  }

  /** doc_id-derived URL planting shared by q63/q64 (mirrored literally in
    * their oracle SQL): most docs get a mod-20 example.com URL, every third
    * doc also a mod-5 bad.net URL, every eleventh doc none at all. */
  private def plantUrls(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 11 === 0, lit(""))
          .otherwise(concat(
            lit(" see https://site"), (col("doc_id") % 20).cast("string"),
            lit(".example.com/p/"), col("doc_id").cast("string"))),
        when(col("doc_id") % 3 === 0,
          concat(lit(" http://blocked"), (col("doc_id") % 5).cast("string"),
            lit(".bad.net/x")))
          .otherwise(lit(""))).as("text"))

  /** The same construction in DuckDB SQL, as a CTE body over `documents`. */
  private val urlAugSql = """
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 11 = 0 THEN ''
                     ELSE ' see https://site' || CAST(doc_id % 20 AS VARCHAR)
                          || '.example.com/p/' || CAST(doc_id AS VARCHAR) END
             || CASE WHEN doc_id % 3 = 0
                     THEN ' http://blocked' || CAST(doc_id % 5 AS VARCHAR) || '.bad.net/x'
                     ELSE '' END AS text
      FROM documents"""

  /** Shared CTE prefix for q131/q132: one unrolled PQ training iteration
    * (m=4 subspaces × ksub=4 codes × dsub=16 dims, lowest-id init) with
    * the assignment argmin on round(‖x‖²−2x·c+‖c‖², 6) and lowest-code
    * ties — the exact Similarity.pqTrain rule. `a2` is the post-training
    * assignment (= Similarity.pqEncode against the trained books). */
  private val pqCtes = """
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ss AS (SELECT unnest(range(0, 4)) AS s),
      dims AS (SELECT unnest(range(1, 17)) AS i),
      subs AS (SELECT vec_id, s, v[s*16+1 : s*16+16] AS sv FROM e CROSS JOIN ss),
      c0 AS (SELECT s, row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS code,
                    sv AS cv
             FROM subs WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT 4)),
      a1 AS (SELECT vec_id, s, code FROM (
               SELECT sub.vec_id, sub.s, c.code,
                      row_number() OVER (PARTITION BY sub.vec_id, sub.s
                        ORDER BY round(list_dot_product(sub.sv, sub.sv)
                              - 2 * list_dot_product(sub.sv, c.cv)
                              + list_dot_product(c.cv, c.cv), 6), c.code) AS rn
               FROM subs sub JOIN c0 c ON sub.s = c.s) WHERE rn = 1),
      m1 AS (SELECT a.s, a.code, d.i, avg(sub.sv[d.i]) AS x
             FROM a1 a JOIN subs sub ON a.vec_id = sub.vec_id AND a.s = sub.s
                  CROSS JOIN dims d
             GROUP BY a.s, a.code, d.i),
      c1 AS (SELECT c0.s, c0.code, coalesce(mm.cv, c0.cv) AS cv
             FROM c0 LEFT JOIN (SELECT s, code, list(x ORDER BY i) AS cv
                                FROM m1 GROUP BY s, code) mm
                  ON c0.s = mm.s AND c0.code = mm.code),
      a2 AS (SELECT vec_id, s, code FROM (
               SELECT sub.vec_id, sub.s, c.code,
                      row_number() OVER (PARTITION BY sub.vec_id, sub.s
                        ORDER BY round(list_dot_product(sub.sv, sub.sv)
                              - 2 * list_dot_product(sub.sv, c.cv)
                              + list_dot_product(c.cv, c.cv), 6), c.code) AS rn
               FROM subs sub JOIN c1 c ON sub.s = c.s) WHERE rn = 1)"""

  /** q133's bit-interleave, generated from the same bits=8 constant as the
    * Spark side so both engines compute the identical Morton formula. */
  private val zInterleaveSql: String =
    (0 until 8).flatMap(i => Seq(
      s"(((bx >> $i) & 1) * ${1L << (2 * i)})",
      s"(((by >> $i) & 1) * ${1L << (2 * i + 1)})")).mkString(" + ")

  def oracles: Map[String, String] = Map(
    "q57_pii_redaction" -> piiOracle,

    "q166_lsh_occupancy" -> lshOccupancyOracle,

    "q167_rolling_mau" -> s"""
      WITH pe AS (SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
                         CAST(concat('0x', substring(md5('rmau' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
                  FROM events),
      targets AS (SELECT DISTINCT d AS t FROM pe),
      win AS (SELECT t.t, pe.hv FROM pe JOIN targets t ON pe.d BETWEEN t.t - 6 AND t.t),
      parts AS (SELECT t, hv >> 54 AS bucket, hv & ${(1L << 54) - 1} AS w FROM win),
      ranks AS (SELECT t, bucket,
              CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END AS rank FROM parts),
      regs AS (SELECT t, bucket, max(rank) AS reg FROM ranks GROUP BY 1, 2),
      agg AS (SELECT t, sum(1::BIGINT << (55 - reg)) AS z_occ, count(*) AS occ
              FROM regs GROUP BY 1),
      est AS (SELECT t, CAST(z_occ + (64 - occ) * (1::BIGINT << 55) AS DOUBLE) AS z,
                     64 - occ AS zeros FROM agg),
      raws AS (SELECT t, ${Sketches.hllAlpha(64) * 64 * 64} * ${(1L << 55).toDouble} / z AS raw, zeros
               FROM est)
      SELECT t AS day,
             round(CASE WHEN raw <= 160.0 AND zeros > 0
                        THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE)) ELSE raw END, 4) AS hll_est,
             CAST(zeros AS INTEGER) AS zero_regs
      FROM raws ORDER BY day""",

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

    "q164_template_mining" -> """
      WITH planted AS (
        SELECT doc_id,
               CASE WHEN doc_id % 13 = 0
                    THEN 'SYSTEM NOTICE all rights reserved template header text ' || text
                    ELSE text END AS text
        FROM documents),
      p AS (SELECT array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ') AS prefix
            FROM planted)
      SELECT prefix, count(*) AS n_docs FROM p
      GROUP BY prefix HAVING count(*) >= 5 ORDER BY prefix""",

    "q165_embedding_drift" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      dims AS (SELECT unnest(range(1, 65)) AS i),
      ma AS (SELECT list(x ORDER BY i) AS m FROM (
               SELECT d.i, avg(e.v[d.i]) AS x FROM e CROSS JOIN dims d
               WHERE e.vec_id % 2 = 0 GROUP BY d.i)),
      mb AS (SELECT list(x ORDER BY i) AS m FROM (
               SELECT d.i, avg(e.v[d.i]) AS x FROM e CROSS JOIN dims d
               WHERE e.vec_id % 2 = 1 GROUP BY d.i))
      SELECT round(sqrt(list_dot_product(ma.m, ma.m)), 6) AS norm_a,
             round(sqrt(list_dot_product(mb.m, mb.m)), 6) AS norm_b,
             round(list_dot_product(ma.m, mb.m) /
                   (sqrt(list_dot_product(ma.m, ma.m)) * sqrt(list_dot_product(mb.m, mb.m))), 6)
               AS cos_means
      FROM ma CROSS JOIN mb""",

    "q162_interpolated_ppl" -> """
      WITH tr AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
                  WHERE doc_id % 2 = 0),
      sc AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
             WHERE doc_id % 2 = 1),
      trbg AS (SELECT w[p] AS w1, w[p + 1] AS w2
               FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS p
                     FROM tr WHERE len(w) >= 2)),
      c12 AS (SELECT w1, w2, count(*) AS c12 FROM trbg GROUP BY w1, w2),
      c1 AS (SELECT w1, count(*) AS c1 FROM trbg GROUP BY w1),
      uni AS (SELECT t AS w2, count(*) AS cu
              FROM (SELECT unnest(w) AS t FROM tr) GROUP BY t),
      tot AS (SELECT CAST(count(*) AS DOUBLE) AS tt,
                     CAST(count(DISTINCT t) AS DOUBLE) AS v
              FROM (SELECT unnest(w) AS t FROM tr)),
      scbg AS (SELECT doc_id, w[p] AS w1, w[p + 1] AS w2
               FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS p
                     FROM sc WHERE len(w) >= 2)),
      scored AS (
        SELECT scbg.doc_id, count(*) AS n_bigrams,
               exp(-avg(ln(
                 0.7 * (CASE WHEN coalesce(c1.c1, 0) > 0
                             THEN CAST(coalesce(c12.c12, 0) AS DOUBLE) / c1.c1
                             ELSE 0.0 END) +
                 (1.0 - 0.7) * ((coalesce(uni.cu, 0) + 1.0) / (tot.tt + 1.0 * tot.v))))) AS ppl
        FROM scbg LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1)
             LEFT JOIN uni USING (w2) CROSS JOIN tot
        GROUP BY scbg.doc_id)
      SELECT d.doc_id,
             CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             round(s.ppl, 4) AS ppl
      FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
           LEFT JOIN scored s USING (doc_id)
      ORDER BY d.doc_id""",

    "q158_fd_check" -> """
      SELECT source, count(*) AS distinct_y
      FROM (SELECT DISTINCT source, lang FROM documents)
      GROUP BY source HAVING count(*) > 1 ORDER BY source""",

    "q159_entropy_card" -> """
      WITH u AS (SELECT 'lang' AS "column", lang AS value FROM documents
                 UNION ALL SELECT 'source', source FROM documents),
      c AS (SELECT "column", value, count(*) AS c FROM u GROUP BY 1, 2),
      t AS (SELECT "column", CAST(sum(c) AS DOUBLE) AS t, count(*) AS n_values
            FROM c GROUP BY 1)
      SELECT c."column", t.n_values,
             round(-sum((c.c / t.t) * ln(c.c / t.t)), 6) AS entropy_nats
      FROM c JOIN t USING ("column") GROUP BY c."column", t.n_values
      ORDER BY c."column"""",

    "q160_ri_check" -> """
      SELECT l_suppkey, count(*) AS orphan_rows
      FROM lineitem
      WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 <> 0)
      GROUP BY 1 ORDER BY 1""",

    "q161_journeys" -> """
      WITH r AS (SELECT user_id, event_type,
                        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                 FROM events),
      p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
            FROM r WHERE rn <= 5 GROUP BY user_id)
      SELECT path, count(*) AS n_users FROM p GROUP BY path ORDER BY path""",

    "q156_snapshot_diff" -> """
      WITH base AS (SELECT doc_id, text, lang FROM documents),
      old AS (SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN 'stale text' ELSE text END AS text, lang
              FROM base WHERE doc_id % 7 <> 0
              UNION ALL
              SELECT doc_id + 1000000, text, lang FROM base WHERE doc_id % 11 = 0),
      j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   o.text AS ot, o.lang AS ol, n.text AS nt, n.lang AS nl,
                   o.doc_id IS NOT NULL AS ino, n.doc_id IS NOT NULL AS inn
            FROM old o FULL OUTER JOIN base n ON o.doc_id = n.doc_id),
      ops AS (SELECT CASE WHEN NOT ino THEN 'I' WHEN NOT inn THEN 'D'
                          WHEN ot IS DISTINCT FROM nt OR ol IS DISTINCT FROM nl THEN 'U'
                     END AS op,
                     doc_id,
                     CASE WHEN NOT inn THEN ot ELSE nt END AS text,
                     CASE WHEN NOT inn THEN ol ELSE nl END AS lang
              FROM j)
      SELECT op, doc_id, text, lang FROM ops WHERE op IS NOT NULL
      ORDER BY op, doc_id""",

    "q157_snapshot_apply" -> """
      SELECT doc_id, text, lang FROM documents ORDER BY doc_id""",

    "q155_cross_ann" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
      FROM e a JOIN e b ON a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
      WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
      ORDER BY id_a, id_b""",

    "q154_quantile_norm" -> """
      WITH r AS (SELECT doc_id, source, n_chars,
                        row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) - 1 AS rank,
                        count(*) OVER (PARTITION BY source) AS n
                 FROM documents)
      SELECT doc_id, source, n_chars,
             CASE WHEN n > 1 THEN round(CAST(rank AS DOUBLE) / (n - 1), 6) ELSE 0.0 END AS pct
      FROM r ORDER BY doc_id""",

    "q152_expectations" -> """
      WITH m AS (SELECT count(*) AS n,
                        sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS nn,
                        min(n_chars) AS mn, count(DISTINCT lang) AS dl
                 FROM documents)
      SELECT * FROM (
        SELECT 'row_count_at_least_100' AS "check", n >= 100 AS passed FROM m
        UNION ALL SELECT 'no_null_text', nn = 0 FROM m
        UNION ALL SELECT 'n_chars_positive', mn > 0 FROM m
        UNION ALL SELECT 'langs_at_most_10', dl <= 10 FROM m
        UNION ALL SELECT 'always_fails', n < 0 FROM m)
      ORDER BY "check"""",

    "q153_histogram_drift" -> """
      WITH a AS (SELECT (least(greatest(n_chars, 0), 4095) * 16) // 4096 AS bin, count(*) AS ca
                 FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
      b AS (SELECT (least(greatest(n_chars, 0), 4095) * 16) // 4096 AS bin, count(*) AS cb
            FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
      m AS (SELECT coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
            FROM a FULL OUTER JOIN b USING (bin)),
      t AS (SELECT CAST(sum(ca) AS DOUBLE) AS ta, CAST(sum(cb) AS DOUBLE) AS tb FROM m)
      SELECT round(sum(abs(ca/ta - cb/tb)) / 2.0, 6) AS tv_distance FROM m CROSS JOIN t""",

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

    // degree-ordered compact-forward re-derived relationally: direct each
    // undirected edge low→high under (degree, id), wedge at the lower
    // endpoint, closure via either orientation of the third edge.
    "q169_triangles" -> """
      WITH raw AS (SELECT doc_id % 100 AS s, (doc_id * 31 + 7) % 100 AS d FROM documents),
      und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM raw WHERE s <> d),
      deg AS (SELECT n AS node, count(*) AS degree
              FROM (SELECT a AS n FROM und UNION ALL SELECT b FROM und) GROUP BY n),
      wd AS (SELECT u.a, u.b, da.degree AS da, db.degree AS db
             FROM und u JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node),
      dir AS (SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS u,
                     CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS v
              FROM wd),
      wedges AS (SELECT e1.u AS tu, e1.v AS tv, e2.v AS tw
                 FROM dir e1 JOIN dir e2 ON e1.u = e2.u AND e1.v < e2.v),
      closing AS (SELECT u AS tv, v AS tw FROM dir UNION ALL SELECT v, u FROM dir),
      tris AS (SELECT w.tu, w.tv, w.tw FROM wedges w
               WHERE EXISTS (SELECT 1 FROM closing c WHERE c.tv = w.tv AND c.tw = w.tw)),
      pn AS (SELECT node, count(*) AS tri_cnt FROM (
               SELECT tu AS node FROM tris UNION ALL
               SELECT tv FROM tris UNION ALL
               SELECT tw FROM tris) GROUP BY node)
      SELECT deg.node, deg.degree,
             CAST(coalesce(pn.tri_cnt, 0) AS BIGINT) AS tri_cnt,
             CASE WHEN deg.degree >= 2
                  THEN CAST(floor(2.0 * coalesce(pn.tri_cnt, 0) /
                             (deg.degree * (deg.degree - 1)) * 1000000.0 + 0.5) AS DOUBLE)
                       / 1000000.0
                  ELSE 0.0 END AS clustering
      FROM deg LEFT JOIN pn USING (node) ORDER BY node""",

    "q170_pmi_collocations" -> """
      WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
      uni AS (SELECT t, count(*) AS c
              FROM (SELECT unnest(w) AS t FROM toks) GROUP BY t),
      tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uni),
      bi AS (SELECT w[CAST(i AS INTEGER)] || ' ' || w[CAST(i AS INTEGER) + 1] AS p
             FROM (SELECT w, unnest(range(1, len(w))) AS i FROM toks WHERE len(w) >= 2)),
      bic AS (SELECT p, count(*) AS c12 FROM bi GROUP BY p HAVING count(*) >= 5),
      btot AS (SELECT CAST(sum(CASE WHEN len(w) > 1 THEN len(w) - 1 ELSE 0 END) AS DOUBLE) AS b
               FROM toks)
      SELECT bic.p AS pair, CAST(bic.c12 AS BIGINT) AS cnt,
             CAST(floor(ln((bic.c12 / btot.b) / ((u1.c / tot.n) * (u2.c / tot.n)))
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS pmi
      FROM bic JOIN uni u1 ON u1.t = string_split(bic.p, ' ')[1]
               JOIN uni u2 ON u2.t = string_split(bic.p, ' ')[2]
           CROSS JOIN tot CROSS JOIN btot
      ORDER BY pmi DESC, pair LIMIT 50""",

    "q171_chi2_keywords" -> """
      WITH occ AS (SELECT lang AS grp, unnest(string_split(text, ' ')) AS term FROM documents),
      gt AS (SELECT grp, term, count(*) AS a FROM occ GROUP BY grp, term),
      tm AS (SELECT term, CAST(sum(a) AS BIGINT) AS t FROM gt GROUP BY term),
      gm AS (SELECT grp, CAST(sum(a) AS BIGINT) AS g FROM gt GROUP BY grp),
      tot AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM gt),
      cells AS (
        SELECT gt.grp, gt.term, gt.a,
               tm.t - gt.a AS b, gm.g - gt.a AS c, tot.n - gm.g - (tm.t - gt.a) AS d,
               tot.n AS n
        FROM gt JOIN tm USING (term) JOIN gm USING (grp) CROSS JOIN tot
        WHERE gt.a >= 20),
      scored AS (
        SELECT grp, term, a,
               CAST(floor((CAST(n AS DOUBLE) *
                      pow(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) -
                          CAST(b AS DOUBLE) * CAST(c AS DOUBLE), 2)) /
                     (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE) *
                      CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE))
                     * 10000.0 + 0.5) AS DOUBLE) / 10000.0 AS chi2
        FROM cells),
      ranked AS (SELECT grp, term, a, chi2,
                        row_number() OVER (PARTITION BY grp ORDER BY chi2 DESC, term) AS rnk
                 FROM scored)
      SELECT grp, CAST(rnk AS INTEGER) AS rnk, term, CAST(a AS BIGINT) AS cnt, chi2
      FROM ranked WHERE rnk <= 5 ORDER BY grp, rnk""",

    // per-term contributions on a 1e-7 integer grid before the sum —
    // integer sums are order-free, so both engines (and every Spark
    // re-run) produce the identical statistic by construction.
    "q172_kl_divergence" -> """
      WITH occ AS (SELECT source AS slice, unnest(string_split(text, ' ')) AS t FROM documents),
      st AS (SELECT slice, t, count(*) AS cs FROM occ GROUP BY slice, t),
      tm AS (SELECT t, CAST(sum(cs) AS BIGINT) AS ct FROM st GROUP BY t),
      stot AS (SELECT slice, CAST(sum(cs) AS BIGINT) AS ts FROM st GROUP BY slice),
      corp AS (SELECT CAST(sum(ct) AS BIGINT) AS tt, count(*) AS v FROM tm),
      terms AS (SELECT st.slice,
                       CAST(floor(((st.cs / CAST(stot.ts AS DOUBLE)) *
                                   ln((st.cs / CAST(stot.ts AS DOUBLE)) /
                                      (CAST(tm.ct + 1 AS DOUBLE) / (corp.tt + corp.v))))
                                  * 10000000.0 + 0.5) AS BIGINT) AS c7
                FROM st JOIN tm USING (t) JOIN stot USING (slice) CROSS JOIN corp)
      SELECT slice,
             CAST(floor(CAST(sum(c7) AS DOUBLE) / 10000000.0 * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS kl_nats
      FROM terms GROUP BY slice ORDER BY slice""",

    "q173_script_mix" -> s"""
      WITH planted AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 53 = 0 THEN ' damaged � here' ELSE '' END
                    || CASE WHEN doc_id % 67 = 0 THEN ' cafÃ©' ELSE '' END AS t
        FROM documents),
      m AS (SELECT doc_id, t, CAST(len(t) AS DOUBLE) AS l,
                   len(t) - len(regexp_replace(t, '[A-Za-z]', '', 'g')) AS ca,
                   len(t) - len(regexp_replace(t, '[0-9]', '', 'g')) AS cd,
                   len(t) - len(regexp_replace(t, '[ \\t\\n\\r]', '', 'g')) AS cs,
                   len(t) - len(regexp_replace(t, '[!-/:-@\\[-`{-~]', '', 'g')) AS cp
            FROM planted)
      SELECT doc_id,
             CASE WHEN l > 0 THEN CAST(floor(ca / l * 10000.0 + 0.5) AS DOUBLE) / 10000.0 ELSE 0.0 END AS frac_alpha,
             CASE WHEN l > 0 THEN CAST(floor(cd / l * 10000.0 + 0.5) AS DOUBLE) / 10000.0 ELSE 0.0 END AS frac_digit,
             CASE WHEN l > 0 THEN CAST(floor(cs / l * 10000.0 + 0.5) AS DOUBLE) / 10000.0 ELSE 0.0 END AS frac_space,
             CASE WHEN l > 0 THEN CAST(floor(cp / l * 10000.0 + 0.5) AS DOUBLE) / 10000.0 ELSE 0.0 END AS frac_punct,
             CASE WHEN l > 0
                  THEN CAST(floor((1.0
                         - CAST(floor(ca / l * 10000.0 + 0.5) AS DOUBLE) / 10000.0
                         - CAST(floor(cd / l * 10000.0 + 0.5) AS DOUBLE) / 10000.0
                         - CAST(floor(cs / l * 10000.0 + 0.5) AS DOUBLE) / 10000.0
                         - CAST(floor(cp / l * 10000.0 + 0.5) AS DOUBLE) / 10000.0)
                         * 10000.0 + 0.5) AS DOUBLE) / 10000.0
                  ELSE 0.0 END AS frac_other,
             (contains(t, '�') OR contains(t, 'Ã©') OR
              contains(t, 'Ã¢') OR contains(t, 'â€')) AS mojibake
      FROM m ORDER BY doc_id""",

    "q174_hist_quantiles" -> """
      WITH h AS (
        SELECT lang,
               ((greatest(CAST(0 AS BIGINT), least(CAST(1023 AS BIGINT), CAST(n_chars AS BIGINT)))) * 64) // 1024 AS bin,
               count(*) AS cnt
        FROM documents GROUP BY lang, bin),
      c AS (SELECT lang, bin, cnt,
                   sum(cnt) OVER (PARTITION BY lang ORDER BY bin
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   sum(cnt) OVER (PARTITION BY lang) AS n
            FROM h),
      qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q),
      hit AS (SELECT c.lang, qs.q, c.bin, c.cnt,
                     qs.q * c.n AS target, c.cum - c.cnt AS before
              FROM c CROSS JOIN qs
              WHERE c.cum >= qs.q * c.n AND c.cum - c.cnt < qs.q * c.n)
      SELECT lang, q,
             CAST(floor((0 + (bin + (target - before) / cnt) * (CAST(1024 AS DOUBLE) / 64))
                        * 10000.0 + 0.5) AS DOUBLE) / 10000.0 AS est
      FROM hit ORDER BY lang, q""",

    // floor-epochs + the salted fractional coin, unrolled per language:
    // thresholds are floor(frac · 2^60) literals (de/en frac .5, fr .25,
    // es/zh integral); range(0, copies) drops zero-copy rows.
    "q175_epoch_mix" -> s"""
      WITH base AS (
        SELECT doc_id, lang,
               CASE lang WHEN 'de' THEN 2 WHEN 'en' THEN 0 WHEN 'es' THEN 1
                         WHEN 'fr' THEN 1 WHEN 'zh' THEN 2 ELSE 0 END
               + CASE lang
                   WHEN 'de' THEN CASE WHEN ${duckKeyHash("doc_id", "em1")} < 576460752303423488 THEN 1 ELSE 0 END
                   WHEN 'en' THEN CASE WHEN ${duckKeyHash("doc_id", "em1")} < 576460752303423488 THEN 1 ELSE 0 END
                   WHEN 'fr' THEN CASE WHEN ${duckKeyHash("doc_id", "em1")} < 288230376151711744 THEN 1 ELSE 0 END
                   ELSE 0 END AS copies
        FROM documents)
      SELECT doc_id, lang, CAST(unnest(range(0, copies)) AS BIGINT) AS epoch
      FROM base ORDER BY doc_id, epoch""",

    "q176_ngram_novelty" -> """
      WITH sh AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
                    ELSE [array_to_string(w, ' ')] END AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
      ref AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 2 = 0),
      dg AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 2 = 1),
      tot AS (SELECT doc_id, count(*) AS total_grams FROM dg GROUP BY doc_id),
      nov AS (SELECT doc_id, count(*) AS novel_grams FROM dg
              WHERE NOT EXISTS (SELECT 1 FROM ref WHERE ref.g = dg.g)
              GROUP BY doc_id)
      SELECT tot.doc_id, CAST(tot.total_grams AS BIGINT) AS total_grams,
             CAST(coalesce(nov.novel_grams, 0) AS BIGINT) AS novel_grams,
             CAST(floor(coalesce(nov.novel_grams, 0) / CAST(tot.total_grams AS DOUBLE)
                        * 10000.0 + 0.5) AS DOUBLE) / 10000.0 AS novelty
      FROM tot LEFT JOIN nov USING (doc_id) ORDER BY tot.doc_id""",

    // median = the shared interpolated-percentile definition
    // (quantile_cont); mode made deterministic as argmax over
    // (count, -value) — the same max-struct rule keepBestPerCluster uses.
    "q177_median_mode" -> """
      WITH med AS (SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med_qty
                   FROM lineitem GROUP BY l_returnflag),
      c AS (SELECT l_returnflag, l_quantity, count(*) AS cnt
            FROM lineitem GROUP BY l_returnflag, l_quantity),
      m AS (SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_cnt,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY cnt DESC, l_quantity) AS rn
            FROM c)
      SELECT med.l_returnflag, med.med_qty, m.mode_qty, CAST(m.mode_cnt AS BIGINT) AS mode_cnt
      FROM med JOIN m USING (l_returnflag)
      WHERE m.rn = 1 ORDER BY med.l_returnflag""",

    "q178_winsorize" -> """
      WITH b AS (SELECT lang, quantile_cont(n_chars, 0.05) AS lo,
                        quantile_cont(n_chars, 0.95) AS hi
                 FROM documents GROUP BY lang)
      SELECT doc_id, d.lang, n_chars,
             CAST(floor(greatest(b.lo, least(b.hi, CAST(n_chars AS DOUBLE)))
                        * 10000.0 + 0.5) AS DOUBLE) / 10000.0 AS winsorized
      FROM documents d JOIN b USING (lang) ORDER BY doc_id""",

    // two peel rounds unrolled: drop degree-<11 nodes, restrict edges,
    // repeat; final degrees on the restricted edge set.
    "q179_degree_peel" -> """
      WITH raw AS (SELECT doc_id % 80 AS s,
                          (doc_id // 80 * 7 + doc_id * 13 + 5) % 80 AS d
                   FROM documents),
      e0 AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM raw WHERE s <> d),
      d0 AS (SELECT n AS node, count(*) AS degree
             FROM (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0) GROUP BY n),
      k0 AS (SELECT node FROM d0 WHERE degree >= 11),
      e1 AS (SELECT a, b FROM e0
             WHERE a IN (SELECT node FROM k0) AND b IN (SELECT node FROM k0)),
      d1 AS (SELECT n AS node, count(*) AS degree
             FROM (SELECT a AS n FROM e1 UNION ALL SELECT b FROM e1) GROUP BY n),
      k1 AS (SELECT node FROM d1 WHERE degree >= 11),
      e2 AS (SELECT a, b FROM e1
             WHERE a IN (SELECT node FROM k1) AND b IN (SELECT node FROM k1)),
      d2 AS (SELECT n AS node, count(*) AS degree
             FROM (SELECT a AS n FROM e2 UNION ALL SELECT b FROM e2) GROUP BY n)
      SELECT node, degree FROM d2 WHERE degree >= 11 ORDER BY node""",

    // q202: every leg re-derived — the q191-shape unrolled PPR, the q169
    // wedge/closure triangle count over the co-citation projection, the
    // q179 unrolled peel at k=25 — then the same scaled-floor composition
    // and the per-doc gate join. Domains cross into the long-keyed legs
    // via the engine's 60-bit md5 id (q104's CAST(concat('0x',...)) form).
    "q202_link_authority_gate" -> """
      WITH e AS (SELECT DISTINCT src, dst FROM (
        SELECT source AS src,
               'site' || CAST(((doc_id // 20) % (CASE WHEN doc_id % 20 < 8 THEN 25 ELSE 3 END)
                               + (doc_id % 20) * 2) % 40 AS VARCHAR) || '.example.com' AS dst
        FROM documents WHERE doc_id % 11 <> 0
        UNION ALL
        SELECT source, 'blocked' || CAST(doc_id % 5 AS VARCHAR) || '.bad.net'
        FROM documents WHERE doc_id % 9 = 0)),
      nodes AS (SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      tl AS (SELECT node,
                    CASE WHEN node IN ('src0', 'src1') THEN 1.0 / 2 ELSE 0.0 END AS tele
             FROM nodes),
      sdeg AS (SELECT src, count(*) AS dg FROM e GROUP BY src),
      r0 AS (SELECT node, tele AS rank FROM tl),
      pc1 AS (SELECT e.dst, sum(r.rank / d.dg) AS contrib
              FROM e JOIN r0 r ON e.src = r.node JOIN sdeg d ON e.src = d.src
              GROUP BY e.dst),
      r1 AS (SELECT tl.node, (1.0 - 0.85) * tl.tele + 0.85 * coalesce(pc1.contrib, 0.0) AS rank
             FROM tl LEFT JOIN pc1 ON tl.node = pc1.dst),
      pc2 AS (SELECT e.dst, sum(r.rank / d.dg) AS contrib
              FROM e JOIN r1 r ON e.src = r.node JOIN sdeg d ON e.src = d.src
              GROUP BY e.dst),
      r2 AS (SELECT tl.node, (1.0 - 0.85) * tl.tele + 0.85 * coalesce(pc2.contrib, 0.0) AS rank
             FROM tl LEFT JOIN pc2 ON tl.node = pc2.dst),
      ids AS (SELECT dst AS domain,
                     CAST(concat('0x', substring(md5(dst), 1, 15)) AS BIGINT) AS id
              FROM (SELECT DISTINCT dst FROM e)),
      em AS (SELECT e.src, ids.id FROM e JOIN ids ON e.dst = ids.domain),
      und AS (SELECT DISTINCT a.id AS a, b.id AS b
              FROM em a JOIN em b ON a.src = b.src AND a.id < b.id),
      tdeg AS (SELECT n AS node, count(*) AS degree
               FROM (SELECT a AS n FROM und UNION ALL SELECT b FROM und) GROUP BY n),
      wd AS (SELECT u.a, u.b, da.degree AS da, db.degree AS db
             FROM und u JOIN tdeg da ON u.a = da.node JOIN tdeg db ON u.b = db.node),
      dir AS (SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS u,
                     CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS v
              FROM wd),
      wedges AS (SELECT e1.u AS tu, e1.v AS tv, e2.v AS tw
                 FROM dir e1 JOIN dir e2 ON e1.u = e2.u AND e1.v < e2.v),
      closing AS (SELECT u AS tv, v AS tw FROM dir UNION ALL SELECT v, u FROM dir),
      tris AS (SELECT w.tu, w.tv, w.tw FROM wedges w
               WHERE EXISTS (SELECT 1 FROM closing c WHERE c.tv = w.tv AND c.tw = w.tw)),
      pn AS (SELECT node, count(*) AS tri_cnt FROM (
               SELECT tu AS node FROM tris UNION ALL
               SELECT tv FROM tris UNION ALL
               SELECT tw FROM tris) GROUP BY node),
      clus AS (SELECT tdeg.node AS id,
                      CASE WHEN tdeg.degree >= 2
                           THEN CAST(floor(2.0 * coalesce(pn.tri_cnt, 0) /
                                  (tdeg.degree * (tdeg.degree - 1)) * 1000000.0 + 0.5) AS DOUBLE)
                                / 1000000.0
                           ELSE 0.0 END AS clustering
               FROM tdeg LEFT JOIN pn USING (node)),
      k0 AS (SELECT node FROM tdeg WHERE degree >= 25),
      pe1 AS (SELECT a, b FROM und
              WHERE a IN (SELECT node FROM k0) AND b IN (SELECT node FROM k0)),
      pd1 AS (SELECT n AS node, count(*) AS degree
              FROM (SELECT a AS n FROM pe1 UNION ALL SELECT b FROM pe1) GROUP BY n),
      k1 AS (SELECT node FROM pd1 WHERE degree >= 25),
      pe2 AS (SELECT a, b FROM pe1
              WHERE a IN (SELECT node FROM k1) AND b IN (SELECT node FROM k1)),
      pd2 AS (SELECT n AS node, count(*) AS degree
              FROM (SELECT a AS n FROM pe2 UNION ALL SELECT b FROM pe2) GROUP BY n),
      core AS (SELECT node AS id FROM pd2 WHERE degree >= 25),
      auth AS (SELECT i.domain,
                      coalesce(r2.rank, 0.0) AS rank,
                      coalesce(c.clustering, 0.0) AS clustering,
                      (core.id IS NOT NULL) AS in_core,
                      CAST(floor(coalesce(r2.rank, 0.0) *
                             (0.5 + 0.5 * coalesce(c.clustering, 0.0)) *
                             (CASE WHEN core.id IS NOT NULL THEN 1.0 ELSE 0.5 END)
                             * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0 AS score
               FROM ids i
               LEFT JOIN r2 ON r2.node = i.domain
               LEFT JOIN clus c ON c.id = i.id
               LEFT JOIN core ON core.id = i.id)
      SELECT d.doc_id,
             'site' || CAST(d.doc_id % 40 AS VARCHAR) || '.example.com' AS domain,
             coalesce(a.score, 0.0) AS score,
             coalesce(a.in_core, false) AS in_core,
             (coalesce(a.score, 0.0) >= 0.004) AS keep
      FROM documents d
      LEFT JOIN auth a ON a.domain = 'site' || CAST(d.doc_id % 40 AS VARCHAR) || '.example.com'
      ORDER BY d.doc_id""",

    "q180_rank_battery" -> """
      SELECT o_orderkey, o_orderstatus,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey""",

    "q181_lexical_diversity" -> """
      WITH c AS (SELECT lang AS grp, t, count(*) AS c FROM
                   (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents)
                 GROUP BY grp, t)
      SELECT grp,
             CAST(sum(c) AS BIGINT) AS total_tokens,
             count(*) AS distinct_terms,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_terms,
             CAST(floor(count(*) / CAST(sum(c) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS ttr,
             CAST(floor(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS hapax_frac,
             CAST(floor(sum(CAST(c AS DOUBLE) * CAST(c - 1 AS DOUBLE)) /
                   (CAST(sum(c) AS DOUBLE) * CAST(sum(c) - 1 AS DOUBLE))
                   * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS simpson
      FROM c GROUP BY grp ORDER BY grp""",

    "q182_attribution" -> """
      WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts AS click_ts, max(event_id) AS click_id
            FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
      SELECT p.event_id, p.user_id,
             CASE WHEN c.click_id IS NOT NULL
                   AND epoch_us(p.ts) - epoch_us(c.click_ts) <= 604800000000
                  THEN c.click_id END AS attributed_click,
             CASE WHEN c.click_id IS NOT NULL
                   AND epoch_us(p.ts) - epoch_us(c.click_ts) <= 604800000000
                  THEN epoch_us(p.ts) - epoch_us(c.click_ts) END AS lag_us
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND p.ts >= c.click_ts
      ORDER BY p.event_id""",

    // serial per-key fold as a recursive CTE — same doubles, same order,
    // so the smoothed values match the Spark fold bitwise before round.
    "q183_ewma" -> """
      WITH RECURSIVE x AS (
        SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
        FROM events),
      r AS (
        SELECT user_id, i, value AS e FROM x WHERE i = 1
        UNION ALL
        SELECT x.user_id, x.i, 0.25 * x.value + (1 - 0.25) * r.e
        FROM r JOIN x ON x.user_id = r.user_id AND x.i = r.i + 1)
      SELECT x.user_id, x.ts, x.event_id, x.value,
             CAST(floor(r.e * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS ewma
      FROM x JOIN r ON x.user_id = r.user_id AND x.i = r.i
      ORDER BY x.user_id, x.ts, x.event_id""",

    "q184_cusum" -> """
      WITH RECURSIVE x AS (
        SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
        FROM events),
      r AS (
        SELECT user_id, i,
               greatest(0.0, value - 50.0 - 10.0) AS cp,
               greatest(0.0, 50.0 - 10.0 - value) AS cn
        FROM x WHERE i = 1
        UNION ALL
        SELECT x.user_id, x.i,
               greatest(0.0, r.cp + (x.value - 50.0 - 10.0)),
               greatest(0.0, r.cn + (50.0 - 10.0 - x.value))
        FROM r JOIN x ON x.user_id = r.user_id AND x.i = r.i + 1)
      SELECT x.user_id, x.ts, x.event_id, x.value,
             CAST(floor(r.cp * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS cusum_pos,
             CAST(floor(r.cn * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS cusum_neg,
             (r.cp > 200.0 OR r.cn > 200.0) AS alarm
      FROM x JOIN r ON x.user_id = r.user_id AND x.i = r.i
      ORDER BY x.user_id, x.ts, x.event_id""",

    "q185_mad_outliers" -> """
      WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                   FROM events GROUP BY event_type),
      w AS (SELECT e.event_id, e.event_type, e.value, med.med,
                   abs(CAST(e.value AS DOUBLE) - med.med) AS ad
            FROM events e JOIN med USING (event_type)),
      mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM w GROUP BY event_type),
      z AS (SELECT w.event_id, w.event_type, w.value,
                   CASE WHEN mad.mad > 0.0
                        THEN CAST(floor(0.6745 * (CAST(w.value AS DOUBLE) - w.med) / mad.mad
                                        * 10000.0 + 0.5) AS DOUBLE) / 10000.0
                   END AS robust_z
            FROM w JOIN mad USING (event_type))
      SELECT event_id, event_type, value, robust_z,
             coalesce(abs(robust_z) > 3.5, false) AS is_outlier
      FROM z ORDER BY event_id""",

    "q186_benford" -> """
      WITH d AS (SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                             AS INTEGER) AS digit
                 FROM orders WHERE o_totalprice >= 1),
      c AS (SELECT digit, count(*) AS cnt FROM d GROUP BY digit),
      t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM c)
      SELECT digit, CAST(cnt AS BIGINT) AS cnt,
             CAST(floor(cnt / t.n * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS obs_frac,
             CAST(floor(log10(1.0 + 1.0 / digit) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS exp_frac
      FROM c CROSS JOIN t ORDER BY digit""",

    "q187_trimmed_mean" -> """
      WITH b AS (SELECT lang, quantile_cont(n_chars, 0.1) AS lo,
                        quantile_cont(n_chars, 0.9) AS hi
                 FROM documents GROUP BY lang),
      k AS (SELECT d.lang, n_chars FROM documents d JOIN b USING (lang)
            WHERE n_chars >= b.lo AND n_chars <= b.hi)
      SELECT lang, count(*) AS kept_rows,
             CAST(floor(CAST(sum(n_chars) AS DOUBLE) / count(*) * 10000.0 + 0.5) AS DOUBLE)
               / 10000.0 AS trimmed_mean
      FROM k GROUP BY lang ORDER BY lang""",

    "q188_funnel_lags" -> """
      WITH r1 AS (SELECT user_id, min(ts) AS t1 FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
      r2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN r1 ON e.user_id = r1.user_id
             WHERE e.event_type = 'click' AND e.ts > r1.t1 GROUP BY e.user_id),
      r3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN r2 ON e.user_id = r2.user_id
             WHERE e.event_type = 'purchase' AND e.ts > r2.t2 GROUP BY e.user_id),
      l AS (SELECT 'view>click' AS transition,
                   epoch_us(r2.t2) - epoch_us(r1.t1) AS lag_us
            FROM r1 JOIN r2 ON r1.user_id = r2.user_id
            UNION ALL
            SELECT 'click>purchase', epoch_us(r3.t3) - epoch_us(r2.t2)
            FROM r2 JOIN r3 ON r2.user_id = r3.user_id)
      SELECT transition, count(*) AS n_users,
             quantile_cont(lag_us, 0.25) AS p25,
             quantile_cont(lag_us, 0.5) AS p50,
             quantile_cont(lag_us, 0.75) AS p75
      FROM l GROUP BY transition ORDER BY transition""",

    "q192_multitouch" -> """
      WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pts
                 FROM events WHERE event_type = 'purchase'),
      c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS cts
            FROM events WHERE event_type = 'click'),
      m AS (SELECT c.click_id, p.purchase_id
            FROM c JOIN p ON c.user_id = p.user_id
            WHERE c.cts <= p.pts AND c.cts >= p.pts - 604800000000),
      np AS (SELECT purchase_id, count(*) AS np FROM m GROUP BY purchase_id),
      terms AS (SELECT m.click_id,
                       CAST(floor(1.0 / CAST(np.np AS DOUBLE) * 10000000.0 + 0.5) AS BIGINT) AS c7
                FROM m JOIN np ON m.purchase_id = np.purchase_id)
      SELECT click_id, count(*) AS n_purchases,
             CAST(floor(CAST(sum(c7) AS DOUBLE) / 10000000.0 * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS credit
      FROM terms GROUP BY click_id ORDER BY click_id""",

    "q193_markov" -> """
      WITH tr AS (
        SELECT event_type AS from_type,
               lead(event_type, 1) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS to_type
        FROM events),
      c AS (SELECT from_type, to_type, count(*) AS cnt FROM tr
            WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
      t AS (SELECT from_type, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY from_type)
      SELECT c.from_type, c.to_type, CAST(c.cnt AS BIGINT) AS cnt,
             CAST(floor(c.cnt / CAST(t.tot AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS prob
      FROM c JOIN t ON c.from_type = t.from_type
      ORDER BY c.from_type, c.to_type""",

    "q189_readability" -> """
      WITH m AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS DOUBLE) AS w,
               CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE) AS s,
               CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS DOUBLE) AS y
        FROM documents)
      SELECT doc_id,
             CAST(w AS BIGINT) AS n_words,
             CAST(s AS BIGINT) AS n_sentences,
             CAST(y AS BIGINT) AS n_syllables,
             CASE WHEN w > 0
                  THEN CAST(floor((206.835 - 1.015 * (w / s) - 84.6 * (y / w))
                                  * 10000.0 + 0.5) AS DOUBLE) / 10000.0
             END AS flesch
      FROM m ORDER BY doc_id""",


    "q149_zipf" -> """
      WITH counts AS (SELECT t, count(*) AS c
                      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
                      GROUP BY t ORDER BY c DESC, t LIMIT 1000),
      ranked AS (SELECT c, row_number() OVER (ORDER BY c DESC, t) AS r FROM counts),
      xy AS (SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y FROM ranked),
      s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x*y) AS sxy, sum(x*x) AS sxx FROM xy)
      SELECT CAST(n AS BIGINT) AS n_ranks,
             round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) + 0.0 AS slope,
             round((sy - ((n*sxy - sx*sy)/(n*sxx - sx*sx)) * sx) / n, 4) + 0.0 AS intercept
      FROM s""",

    "q145_ivfpq_adc" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ss AS (SELECT unnest(range(0, 4)) AS s),
      cents AS (SELECT vec_id // 125 AS cid, v AS cv FROM e WHERE vec_id % 125 = 0),
      cell AS (SELECT vec_id, cid FROM (
                 SELECT e.vec_id, c.cid,
                        row_number() OVER (PARTITION BY e.vec_id
                          ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
                 FROM e CROSS JOIN cents c) WHERE rn = 1),
      resid AS (SELECT e.vec_id, cl.cid AS cell,
                       list_transform(range(1, 65), i -> e.v[i] - c.cv[i]) AS rv
                FROM e JOIN cell cl ON e.vec_id = cl.vec_id JOIN cents c ON cl.cid = c.cid),
      rsubs AS (SELECT vec_id, cell, s, rv[s*16+1 : s*16+16] AS sv FROM resid CROSS JOIN ss),
      c0 AS (SELECT s, row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS code, sv AS cv
             FROM rsubs WHERE vec_id IN (SELECT vec_id FROM e ORDER BY vec_id LIMIT 4)),
      codes AS (SELECT vec_id, cell, s, code FROM (
                  SELECT r.vec_id, r.cell, r.s, c.code,
                         row_number() OVER (PARTITION BY r.vec_id, r.s
                           ORDER BY round(list_dot_product(r.sv, r.sv)
                                 - 2 * list_dot_product(r.sv, c.cv)
                                 + list_dot_product(c.cv, c.cv), 6), c.code) AS rn
                  FROM rsubs r JOIN c0 c ON r.s = c.s) WHERE rn = 1),
      probes AS (SELECT vec_id AS probe_id, v FROM e WHERE vec_id < 5),
      psubs AS (SELECT probe_id, s, v[s*16+1 : s*16+16] AS sv FROM probes CROSS JOIN ss),
      pcells AS (SELECT probe_id, cid, pd FROM (
                   SELECT p.probe_id, c.cid, list_dot_product(p.v, c.cv) AS pd,
                          row_number() OVER (PARTITION BY p.probe_id
                            ORDER BY list_cosine_similarity(p.v, c.cv) DESC, c.cid) AS rn
                   FROM probes p CROSS JOIN cents c) WHERE rn <= 2),
      scored AS (SELECT pc.probe_id, cd.vec_id AS nbr_id,
                        round(max(pc.pd) + sum(list_dot_product(ps.sv, b.cv)), 4) + 0.0 AS adc
                 FROM pcells pc
                      JOIN codes cd ON cd.cell = pc.cid
                      JOIN c0 b ON b.s = cd.s AND b.code = cd.code
                      JOIN psubs ps ON ps.probe_id = pc.probe_id AND ps.s = cd.s
                 WHERE cd.vec_id <> pc.probe_id
                 GROUP BY pc.probe_id, cd.vec_id),
      ranked AS (SELECT probe_id, nbr_id, adc,
                        row_number() OVER (PARTITION BY probe_id
                          ORDER BY adc DESC, nbr_id) AS rnk
                 FROM scored)
      SELECT probe_id, rnk, nbr_id, adc AS adc_score
      FROM ranked WHERE rnk <= 5 ORDER BY probe_id, rnk""",

    "q146_rolling_zscore" -> """
      WITH w AS (SELECT user_id, ts, event_id, value,
                        count(value) OVER win AS cnt,
                        avg(value) OVER win AS m,
                        stddev_pop(value) OVER win AS sd
                 FROM events
                 WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
      SELECT user_id, ts, event_id, value,
             CASE WHEN cnt >= 2 AND sd > 0 THEN round((value - m) / sd, 4) + 0.0 END AS zscore,
             CASE WHEN cnt >= 2 AND sd > 0
                  THEN abs(round((value - m) / sd, 4)) > 2.0 ELSE false END AS is_anomaly
      FROM w ORDER BY user_id, ts, event_id""",

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

    "q141_funnel" -> """
      WITH r1 AS (SELECT user_id, min(ts) AS t1 FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
      r2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN r1 ON e.user_id = r1.user_id
             WHERE e.event_type = 'click' AND e.ts > r1.t1 GROUP BY e.user_id),
      r3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN r2 ON e.user_id = r2.user_id
             WHERE e.event_type = 'purchase' AND e.ts > r2.t2 GROUP BY e.user_id)
      SELECT r1.user_id, r1.t1, r2.t2, r3.t3
      FROM r1 LEFT JOIN r2 ON r1.user_id = r2.user_id
           LEFT JOIN r3 ON r1.user_id = r3.user_id
      ORDER BY r1.user_id""",

    "q142_cohort" -> """
      WITH b AS (SELECT user_id,
                        CAST(floor(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7.0) AS BIGINT) AS bkt
                 FROM events),
      f AS (SELECT user_id, min(bkt) AS cohort FROM b GROUP BY user_id),
      a AS (SELECT DISTINCT user_id, bkt FROM b)
      SELECT f.cohort, a.bkt - f.cohort AS offset, count(*) AS active_users
      FROM a JOIN f ON a.user_id = f.user_id
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "q143_bloom_join" -> """
      SELECT s.s_suppkey, s.s_name, count(*) AS cnt,
             CAST(sum(CAST(l.l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_suppkey % 7 = 0
      GROUP BY 1, 2 ORDER BY 1""",

    "q144_histogram" -> """
      SELECT lang, (least(greatest(n_chars, 0), 4095) * 16) // 4096 AS bin, count(*) AS cnt
      FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",

    "q135_c4_rules" -> """
      WITH lined AS (
        SELECT doc_id,
               (text || '.') || chr(10) ||
               'short line.' || chr(10) ||
               CASE WHEN doc_id % 6 = 0 THEN 'Enable javascript to view this page properly.'
                    ELSE 'Another perfectly fine sentence with enough words here.' END || chr(10) ||
               CASE WHEN doc_id % 9 = 0 THEN 'Lorem ipsum dolor sit amet consectetur adipiscing elit.'
                    ELSE 'A third full sentence keeps the document alive today.' END || chr(10) ||
               CASE WHEN doc_id % 11 = 0 THEN 'function f() { return 1; }'
                    ELSE 'no braces here just words without terminal punctuation' END AS text
        FROM documents),
      base AS (SELECT doc_id, text, string_split(text, chr(10)) AS ls FROM lined),
      k AS (SELECT doc_id, text, ls,
              list_filter(ls, l -> len(string_split(trim(l), ' ')) >= 5
                               AND regexp_matches(trim(l), '[.!?"]$')
                               AND NOT contains(lower(l), 'javascript')) AS kept
            FROM base),
      c AS (SELECT doc_id, text, ls, kept, array_to_string(kept, chr(10)) AS ct FROM k),
      f AS (SELECT doc_id, ct AS clean_text,
              len(ls) AS n_lines, len(kept) AS n_kept_lines,
              (len(ct) - len(replace(ct, '.', ''))) + (len(ct) - len(replace(ct, '!', '')))
              + (len(ct) - len(replace(ct, '?', ''))) AS n_sentences,
              contains(lower(text), 'lorem ipsum') AS has_lorem,
              contains(text, '{') AS has_brace
            FROM c)
      SELECT doc_id, clean_text, n_lines, n_kept_lines, n_sentences, has_lorem, has_brace,
             (NOT has_lorem AND NOT has_brace AND n_sentences >= 3) AS keep
      FROM f ORDER BY doc_id""",

    "q136_hits" -> """
      WITH e AS (
        SELECT source AS src,
               'site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS dst
        FROM documents WHERE doc_id % 11 <> 0
        UNION ALL
        SELECT source, 'blocked' || CAST(doc_id % 5 AS VARCHAR) || '.bad.net'
        FROM documents WHERE doc_id % 3 = 0),
      nodes AS (SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      h0 AS (SELECT node, 1.0 / n.n AS hub FROM nodes CROSS JOIN n),
      ar1 AS (SELECT e.dst, sum(h.hub) AS a FROM e JOIN h0 h ON e.src = h.node GROUP BY e.dst),
      as1 AS (SELECT sum(a) AS s FROM ar1),
      a1 AS (SELECT nodes.node, coalesce(ar1.a, 0.0) / as1.s AS auth
             FROM nodes LEFT JOIN ar1 ON nodes.node = ar1.dst CROSS JOIN as1),
      hr1 AS (SELECT e.src, sum(a.auth) AS h FROM e JOIN a1 a ON e.dst = a.node GROUP BY e.src),
      hs1 AS (SELECT sum(h) AS s FROM hr1),
      h1 AS (SELECT nodes.node, coalesce(hr1.h, 0.0) / hs1.s AS hub
             FROM nodes LEFT JOIN hr1 ON nodes.node = hr1.src CROSS JOIN hs1),
      ar2 AS (SELECT e.dst, sum(h.hub) AS a FROM e JOIN h1 h ON e.src = h.node GROUP BY e.dst),
      as2 AS (SELECT sum(a) AS s FROM ar2),
      a2 AS (SELECT nodes.node, coalesce(ar2.a, 0.0) / as2.s AS auth
             FROM nodes LEFT JOIN ar2 ON nodes.node = ar2.dst CROSS JOIN as2),
      hr2 AS (SELECT e.src, sum(a.auth) AS h FROM e JOIN a2 a ON e.dst = a.node GROUP BY e.src),
      hs2 AS (SELECT sum(h) AS s FROM hr2),
      h2 AS (SELECT nodes.node, coalesce(hr2.h, 0.0) / hs2.s AS hub
             FROM nodes LEFT JOIN hr2 ON nodes.node = hr2.src CROSS JOIN hs2)
      SELECT h2.node, round(h2.hub, 6) AS hub, round(a2.auth, 6) AS auth
      FROM h2 JOIN a2 ON h2.node = a2.node ORDER BY h2.node""",

    "q137_trigram_langid" -> """
      WITH tr AS (SELECT lang, lower(text) AS t FROM documents WHERE doc_id % 2 = 0),
      trg AS (SELECT lang, substring(t, CAST(i AS INTEGER), 3) AS gram
              FROM (SELECT lang, t, unnest(range(1, len(t) - 1)) AS i
                    FROM tr WHERE len(t) >= 3)),
      pc AS (SELECT lang, gram, count(*) AS c FROM trg GROUP BY lang, gram),
      prof AS (SELECT lang, gram, rank FROM (
                 SELECT lang, gram,
                        row_number() OVER (PARTITION BY lang ORDER BY c DESC, gram) AS rank
                 FROM pc) WHERE rank <= 20),
      od AS (SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id % 2 = 1),
      og AS (SELECT doc_id, substring(t, CAST(i AS INTEGER), 3) AS gram
             FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
                   FROM od WHERE len(t) >= 3)),
      oc AS (SELECT doc_id, gram, count(*) AS c FROM og GROUP BY doc_id, gram),
      dp AS (SELECT doc_id, gram, drank FROM (
               SELECT doc_id, gram,
                      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS drank
               FROM oc) WHERE drank <= 20),
      langs AS (SELECT DISTINCT lang FROM prof),
      dist AS (SELECT dp.doc_id, l.lang,
                      CAST(sum(coalesce(abs(dp.drank - prof.rank), 20)) AS BIGINT) AS dist
               FROM dp CROSS JOIN langs l
                    LEFT JOIN prof ON prof.lang = l.lang AND prof.gram = dp.gram
               GROUP BY dp.doc_id, l.lang),
      best AS (SELECT doc_id, lang AS pred_lang, dist,
                      row_number() OVER (PARTITION BY doc_id ORDER BY dist, lang) AS rn
               FROM dist)
      SELECT doc_id, pred_lang, dist FROM best WHERE rn = 1 ORDER BY doc_id""",

    "q139_rollup_merge" -> """
      SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS vsum,
             min(n_chars) AS vmin, max(n_chars) AS vmax,
             round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS vavg
      FROM documents GROUP BY lang ORDER BY lang""",

    "q134_weighted_sample" -> s"""
      SELECT doc_id, n_chars FROM (
        SELECT doc_id, n_chars FROM documents
        WHERE CAST(n_chars AS DOUBLE) > 0
        ORDER BY round(-ln((${duckKeyHash("doc_id", "ws1")} + 0.5) / 1152921504606846976.0)
                       / CAST(n_chars AS DOUBLE), 9), doc_id
        LIMIT 100)
      ORDER BY doc_id""",

    "q138_shuffle" -> s"""
      SELECT doc_id,
             row_number() OVER (ORDER BY ${duckKeyHash("doc_id", "sh1")}, doc_id) - 1 AS position,
             (row_number() OVER (ORDER BY ${duckKeyHash("doc_id", "sh1")}, doc_id) - 1) // 1000 AS shard
      FROM documents ORDER BY doc_id""",

    "q140_negative_sample" -> s"""
      WITH pos AS (SELECT doc_id AS neg_id,
                          row_number() OVER (ORDER BY ${duckKeyHash("doc_id", "ns1")}, doc_id) - 1 AS position
                   FROM documents),
      n AS (SELECT count(*) AS n FROM documents),
      draws AS (SELECT d.doc_id AS anchor_id, j.draw,
                       ${duckKeyHash("CAST(d.doc_id AS VARCHAR) || '#' || CAST(j.draw AS VARCHAR)", "ns1")} % n.n AS position
                FROM documents d CROSS JOIN (SELECT unnest(range(0, 3)) AS draw) j
                     CROSS JOIN n)
      SELECT dr.anchor_id, CAST(dr.draw AS INTEGER) AS draw, p.neg_id
      FROM draws dr JOIN pos p USING (position)
      WHERE p.neg_id <> dr.anchor_id
      ORDER BY anchor_id, draw""",

    "q133_zorder" -> s"""
      WITH mm AS (SELECT min(l_partkey) AS mnp, max(l_partkey) AS mxp,
                         min(l_suppkey) AS mns, max(l_suppkey) AS mxs FROM lineitem),
      b AS (SELECT l_orderkey, l_linenumber,
                   ((l_partkey - mnp) * 256) // (mxp - mnp + 1) AS bx,
                   ((l_suppkey - mns) * 256) // (mxs - mns + 1) AS by
            FROM lineitem CROSS JOIN mm)
      SELECT l_orderkey, l_linenumber, $zInterleaveSql AS zval
      FROM b ORDER BY l_orderkey, l_linenumber""",

    "q131_pq_train" -> s"""
      WITH $pqCtes
      SELECT c1.s AS subspace, CAST(c1.code AS BIGINT) AS code,
             d.i - 1 AS dim, round(c1.cv[d.i], 4) + 0.0 AS cval
      FROM c1 CROSS JOIN dims d
      ORDER BY subspace, code, dim""",

    "q132_pq_adc" -> s"""
      WITH $pqCtes,
      probes AS (SELECT vec_id AS probe_id, s, sv FROM subs WHERE vec_id < 5),
      scored AS (SELECT p.probe_id, a.vec_id AS nbr_id,
                        round(sum(list_dot_product(p.sv, c.cv)), 4) + 0.0 AS adc
                 FROM a2 a JOIN c1 c ON a.s = c.s AND a.code = c.code
                      JOIN probes p ON p.s = a.s
                 WHERE a.vec_id <> p.probe_id
                 GROUP BY p.probe_id, a.vec_id),
      ranked AS (SELECT probe_id, nbr_id, adc,
                        row_number() OVER (PARTITION BY probe_id
                          ORDER BY adc DESC, nbr_id) AS rnk
                 FROM scored)
      SELECT probe_id, rnk, nbr_id, adc AS adc_score
      FROM ranked WHERE rnk <= 5 ORDER BY probe_id, rnk""",

    "q63_url_metrics" -> s"""
      WITH aug AS ($urlAugSql)
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, 'https?://[A-Za-z0-9.-]+(?::[0-9]+)?(?:/[^ ]*)?')) AS INTEGER) AS n_urls,
             coalesce(array_to_string(list_sort(list_distinct(
               regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1))), ','), '') AS domains_csv
      FROM aug ORDER BY doc_id""",

    "q64_domain_blocklist" -> s"""
      WITH aug AS ($urlAugSql),
      bad AS (
        SELECT DISTINCT doc_id
        FROM (SELECT doc_id,
                     unnest(list_distinct(regexp_extract_all(text, 'https?://([A-Za-z0-9.-]+)', 1))) AS d
              FROM aug)
        WHERE d IN ('blocked0.bad.net', 'blocked1.bad.net', 'blocked2.bad.net'))
      SELECT doc_id, text FROM aug
      WHERE doc_id NOT IN (SELECT doc_id FROM bad)
      ORDER BY doc_id""",

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

    // Plain BETWEEN join — DuckDB can afford the naive plan at oracle SF;
    // epoch micros derived the same way both sides (ns floor-divided).
    "q69_range_join" -> """
      WITH p AS (SELECT event_id AS point_id, epoch_ns(ts) // 1000 AS t FROM events),
      i AS (SELECT event_id AS interval_id,
                   epoch_ns(ts) // 1000 AS s,
                   epoch_ns(ts) // 1000 + 3600000000 AS e
            FROM events WHERE event_id % 100 = 0)
      SELECT i.interval_id, p.point_id
      FROM i JOIN p ON p.t BETWEEN i.s AND i.e
      ORDER BY interval_id, point_id""",

    // Naive overlap join at oracle SF; the same inclusive-bounds predicate.
    "q70_interval_overlap" -> """
      WITH a AS (SELECT event_id AS a_id, epoch_ns(ts) // 1000 AS s,
                        epoch_ns(ts) // 1000 + 7200000000 AS e
                 FROM events WHERE event_id % 50 = 0),
      b AS (SELECT event_id AS b_id, epoch_ns(ts) // 1000 AS s2,
                   epoch_ns(ts) // 1000 + 3600000000 AS e2
            FROM events WHERE event_id % 70 = 0)
      SELECT a.a_id, b.b_id
      FROM a JOIN b ON a.s <= b.e2 AND b.s2 <= a.e
      ORDER BY a_id, b_id""",

    // Same lang-id CASE as q28's oracle; sums cast to BIGINT (DuckDB sums
    // ints into HUGEINT, Spark into long — the hash compare is dtype-exact).
    "q67_corpus_stats" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      h AS (SELECT doc_id, w,
                   len(list_filter(w, x -> x IN ('der','die','das','und','ist'))) AS de_hits,
                   len(list_filter(w, x -> x IN ('the','a','of','and','is'))) AS en_hits,
                   len(list_filter(w, x -> x IN ('el','la','de','y','es'))) AS es_hits
            FROM t),
      l AS (SELECT CASE WHEN de_hits >= en_hits AND de_hits >= es_hits THEN 'de'
                        WHEN en_hits >= es_hits THEN 'en'
                        ELSE 'es' END AS lang,
                   len(w) AS tc, len(list_distinct(w)) AS dc
            FROM h)
      SELECT lang,
             count(*) AS n_docs,
             CAST(sum(tc) AS BIGINT) AS total_tokens,
             round(CAST(sum(dc) AS DOUBLE) / CAST(sum(tc) AS DOUBLE), 4) AS mean_distinct_ratio
      FROM l GROUP BY lang ORDER BY lang""",

    // Same 120-char truncation as the query; levenshtein agrees between
    // engines (unit edit costs) and similarity is one deterministic division.
    "q68_edit_distance" -> """
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(levenshtein(substring(a.text, 1, 120), substring(b.text, 1, 120)) AS INTEGER) AS edit_dist,
             round(1.0 - CAST(levenshtein(substring(a.text, 1, 120), substring(b.text, 1, 120)) AS DOUBLE)
                   / CAST(greatest(len(substring(a.text, 1, 120)), len(substring(b.text, 1, 120))) AS DOUBLE), 4)
               AS similarity
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      ORDER BY id_a""",

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

    // q73's window formulation with a per-stratum budget literal.
    "q82_token_budget_by_group" -> s"""
      WITH t AS (
        SELECT lang, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS tc,
               ${duckKeyHash("doc_id", "mix-v2")} AS h
        FROM documents),
      c AS (
        SELECT lang, doc_id,
               coalesce(SUM(tc) OVER (PARTITION BY lang ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
        FROM t)
      SELECT lang, doc_id FROM c
      WHERE prefix < CASE WHEN lang = 'de' THEN 800 ELSE 4000 END
      ORDER BY lang, doc_id""",

    // q66's quantize arithmetic + int*double dequantize + q26's cosine
    // ranking, all in identical double arithmetic.
    "q81_ann_quantized" -> """
      WITH s AS (
        SELECT vec_id, embedding,
               list_max([CAST(abs(y) AS DOUBLE) for y in embedding]) / 127.0 AS scale
        FROM embeddings),
      dq AS (
        SELECT vec_id,
               CASE WHEN scale = 0
                    THEN [CAST(0 AS DOUBLE) for x in embedding]
                    ELSE [CAST(round(CAST(x AS DOUBLE) / scale) AS INTEGER) * scale for x in embedding]
               END AS v
        FROM s),
      p AS (SELECT vec_id AS probe_id, v AS pv FROM dq WHERE vec_id < 10),
      sc AS (SELECT probe_id, dq.vec_id AS nbr_id, list_cosine_similarity(pv, dq.v) AS sim
             FROM p CROSS JOIN dq WHERE dq.vec_id != probe_id),
      r AS (SELECT probe_id, nbr_id, sim,
                   row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, nbr_id) AS rnk
            FROM sc)
      SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, nbr_id, round(sim, 4) + 0.0 AS cos_sim
      FROM r WHERE rnk <= 5 ORDER BY probe_id, rnk""",

    // Grid + left join + IGNORE NULLS running last_value — the window
    // formulation of the same resample; integer bucket arithmetic agrees.
    "q79_resample_ffill" -> """
      WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS t, event_id FROM events),
      ph AS (SELECT user_id,
                    -- sign-corrected floor division: DuckDB's % keeps the
                    -- dividend's sign and // truncates, so the bare
                    -- (t - t % w) // w is off by one bucket for t < 0;
                    -- pmod-then-divide is exact for any sign (the Spark
                    -- side's bucketOf semantics)
                    (t - ((t % 86400000000 + 86400000000) % 86400000000)) // 86400000000 AS bucket,
                    max(event_id) AS v
             FROM e GROUP BY 1, 2),
      span AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM ph GROUP BY 1),
      grid AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket FROM span),
      j AS (SELECT g.user_id, g.bucket, ph.v
            FROM grid g LEFT JOIN ph ON ph.user_id = g.user_id AND ph.bucket = g.bucket)
      SELECT user_id, bucket,
             last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
      FROM j ORDER BY user_id, bucket""",

    // Layout changes values not at all: the oracle is the plain join+agg.
    "q76_bucketed_join" -> """
      SELECT e.user_id,
             CAST(count(*) AS BIGINT) AS n_pairs,
             max(o.o_orderkey) AS max_order
      FROM events e JOIN orders o ON o.o_custkey = e.user_id
      GROUP BY e.user_id
      ORDER BY e.user_id""",

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

    // The window formulation the skew-proof two-phase form must equal:
    // event_id is unique, so row_number has no tie ambiguity.
    "q71_cap_per_key" -> """
      SELECT user_id, event_id FROM (
        SELECT user_id, event_id,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events)
      WHERE rn <= 3
      ORDER BY user_id, event_id""",

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

    // Single-window formulation of the same exclusive-prefix arithmetic
    // (integer token counts, integer sums — no float divergence to chase);
    // the hash literal is the shared keyHash construction.
    "q73_token_budget" -> s"""
      WITH t AS (
        SELECT lang, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS tc,
               ${duckKeyHash("doc_id", "mix-v1")} AS h
        FROM documents),
      c AS (
        SELECT lang, doc_id,
               coalesce(SUM(tc) OVER (PARTITION BY lang ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
        FROM t)
      SELECT lang, doc_id FROM c WHERE prefix < 5000
      ORDER BY lang, doc_id""",

    // Identical double arithmetic: abs in float is exact, so cast-to-double
    // before max/divide matches Spark's double-projected vector exactly;
    // round() is half-away-from-zero in both engines. Exploded to scalar
    // rows (no WITH ORDINALITY in DuckDB — zip parallel unnests; Spark's
    // posexplode pos is 0-based, so range starts at 0).
    "q66_quantize_int8" -> """
      WITH s AS (
        SELECT vec_id, embedding,
               list_max([CAST(abs(y) AS DOUBLE) for y in embedding]) / 127.0 AS scale
        FROM embeddings),
      e AS (
        SELECT vec_id, scale,
               unnest(range(0, len(embedding))) AS pos,
               unnest(CASE WHEN scale = 0
                           THEN [0 for x in embedding]
                           ELSE [CAST(round(CAST(x AS DOUBLE) / scale) AS INTEGER) for x in embedding]
                      END) AS q
        FROM s)
      SELECT vec_id, CAST(pos AS INTEGER) AS pos, q, scale
      FROM e ORDER BY vec_id, pos""",

    // Same NON-distinct n-gram derivation as q59's oracle (frequency mining
    // counts every occurrence; short docs fall back to one whole-text gram).
    "q65_top_ngrams" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      g AS (
        SELECT CASE WHEN len(w) >= 3
                    THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]
                    ELSE [array_to_string(w, ' ')] END AS grams
        FROM toks),
      e AS (SELECT unnest(grams) AS gram FROM g)
      SELECT gram, count(*) AS cnt FROM e
      GROUP BY gram ORDER BY cnt DESC, gram LIMIT 50""",

    "q59_repetition" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      g AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)]
                    ELSE [array_to_string(w, ' ')] END AS grams
        FROM toks)
      SELECT doc_id,
             CAST(len(grams) AS INTEGER) AS total_ngrams,
             CAST(len(list_distinct(grams)) AS INTEGER) AS distinct_ngrams,
             round((len(grams) - len(list_distinct(grams))) / CAST(len(grams) AS DOUBLE), 4)
               AS dup_ngram_frac
      FROM g ORDER BY doc_id""",
    "q32_dedup_simhash" -> simhashOracle,

    "q119_simhash_idf" -> simhashWeightedOracle,

    "q120_cluster_split" -> clusterSplitOracle,

    "q121_span_corruption" -> spanCorruptionOracle,

    "q122_semantic_decon" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ev AS (SELECT v FROM e WHERE vec_id < 10)
      SELECT c.vec_id FROM e c
      WHERE NOT EXISTS (
        SELECT 1 FROM ev WHERE round(list_cosine_similarity(c.v, ev.v), 6) >= 0.3)
      ORDER BY c.vec_id""",

    "q123_bpe_card" -> """
      WITH words AS (
        SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
          SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
          FROM documents)
        WHERE len(w) > 0 GROUP BY w),
      r0 AS (SELECT regexp_replace(w, '(.)', '|\1|', 'g') AS rep, wc FROM words),
      t1 AS (SELECT string_split(trim(rep, '|'), '||') AS t, wc FROM r0),
      p1 AS (SELECT t[p] AS l_sym, t[p+1] AS r_sym, CAST(sum(wc) AS BIGINT) AS pair_count
             FROM (SELECT t, wc, unnest(generate_series(1, len(t) - 1)) AS p
                   FROM t1 WHERE len(t) >= 2)
             GROUP BY 1, 2),
      b1 AS (SELECT l_sym, r_sym FROM p1
             ORDER BY pair_count DESC, l_sym, r_sym LIMIT 1),
      r1 AS (SELECT replace(rep,
               '|' || (SELECT l_sym FROM b1) || '||' || (SELECT r_sym FROM b1) || '|',
               '|' || (SELECT l_sym FROM b1) || (SELECT r_sym FROM b1) || '|') AS rep, wc
             FROM r0),
      t2 AS (SELECT string_split(trim(rep, '|'), '||') AS t, wc FROM r1),
      p2 AS (SELECT t[p] AS l_sym, t[p+1] AS r_sym, CAST(sum(wc) AS BIGINT) AS pair_count
             FROM (SELECT t, wc, unnest(generate_series(1, len(t) - 1)) AS p
                   FROM t2 WHERE len(t) >= 2)
             GROUP BY 1, 2),
      b2 AS (SELECT l_sym, r_sym FROM p2
             ORDER BY pair_count DESC, l_sym, r_sym LIMIT 1),
      pats AS (SELECT
        '|' || b1.l_sym || '||' || b1.r_sym || '|' AS f1,
        '|' || b1.l_sym || b1.r_sym || '|' AS m1,
        '|' || b2.l_sym || '||' || b2.r_sym || '|' AS f2,
        '|' || b2.l_sym || b2.r_sym || '|' AS m2
        FROM b1, b2),
      per_doc AS (
        SELECT d.lang, len(d.text) AS nc, len(string_split(d.text, ' ')) AS nw,
               coalesce(list_sum(list_transform(
                 [x for x in regexp_split_to_array(lower(d.text), '[^a-z0-9]+')
                    if len(x) > 0],
                 w -> len(string_split(trim(
                   replace(replace(regexp_replace(w, '(.)', '|\1|', 'g'), f1, m1), f2, m2),
                   '|'), '||')))), 0) AS nb
        FROM documents d CROSS JOIN pats)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nc) AS BIGINT) AS total_chars,
             CAST(sum(nw) AS BIGINT) AS total_ws_tokens,
             CAST(sum(nb) AS BIGINT) AS total_bpe_tokens,
             round(sum(nc) * 1.0 / sum(nb), 4) AS chars_per_token
      FROM per_doc GROUP BY lang ORDER BY lang""",

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

    "q125_bottomk_sample" -> bottomKSampleOracle,

    "q126_sample_quantiles" -> sampleQuantilesOracle,

    "q128_table_profile" -> tableProfileOracle,

    "q127_group_sample" -> groupSampleOracle,
    "q33_ann_lsh" -> lshAnnOracle,
    "q61_cosine_lsh_prod" -> lshProdRecallOracle,
    "q205_rbo" -> rboOracle,
    "q206_mmr" -> mmrOracle,
    "q209_profile_drift" -> profileDriftOracle,

    // q210: q87's BM25 CTEs with the quantized-selection cut, then the
    // RM3 grids (1e-4 normalizer, 1e-9 contributions) and the alpha=0.5
    // interpolation mirrored op for op.
    "q210_rm3_expansion" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf
             FROM (SELECT doc_id, unnest(w) AS term FROM toks) GROUP BY doc_id, term),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      corpus AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                        CAST(avg(len(w)) AS DOUBLE) AS avgdl FROM toks),
      dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM toks),
      queries(query_id, qtext) AS (VALUES
        (CAST(1 AS BIGINT), 'batch join'),
        (CAST(2 AS BIGINT), 'customer query table'),
        (CAST(3 AS BIGINT), 'nosuchterm')),
      qterms AS (SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS term
                 FROM queries),
      scored AS (
        SELECT q.query_id, tf.doc_id,
               round(sum( ln(1 + (c.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                          * (tf.tf * (1.2 + 1.0))
                          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / c.avgdl)) ), 4) AS score4
        FROM tf JOIN qterms q USING (term) JOIN dfreq USING (term)
             JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN corpus c
        GROUP BY q.query_id, tf.doc_id),
      fb AS (SELECT query_id, doc_id, score4 FROM (
               SELECT query_id, doc_id, score4,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score4 DESC, doc_id) AS rnk
               FROM scored) WHERE rnk <= 10),
      ws AS (SELECT query_id, sum(CAST(floor(score4 * 10000.0 + 0.5) AS BIGINT)) AS s4
             FROM fb GROUP BY query_id),
      contrib AS (
        SELECT fb.query_id, tf.term,
               CAST(floor(fb.score4 / (CAST(ws.s4 AS DOUBLE) / 10000.0)
                          * (CAST(tf.tf AS DOUBLE) / dl.dl)
                          * 1000000000.0 + 0.5) AS BIGINT) AS c9
        FROM fb JOIN ws USING (query_id)
             JOIN tf ON tf.doc_id = fb.doc_id
             JOIN dl ON dl.doc_id = fb.doc_id
        WHERE ws.s4 > 0),
      rm AS (SELECT query_id, term, CAST(sum(c9) AS BIGINT) AS rm9
             FROM contrib GROUP BY query_id, term),
      rmtop AS (SELECT query_id, term, rm9 FROM (
                  SELECT query_id, term, rm9,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY rm9 DESC, term) AS rn
                  FROM rm) WHERE rn <= 8),
      qm AS (SELECT query_id, term,
                    CAST(count(*) AS DOUBLE) / CAST(any_value(ql) AS DOUBLE) AS ptq
             FROM (SELECT query_id, len(qw) AS ql, unnest(qw) AS term
                   FROM (SELECT query_id, string_split(qtext, ' ') AS qw FROM queries))
             GROUP BY query_id, term),
      u AS (SELECT coalesce(qm.query_id, r.query_id) AS query_id,
                   coalesce(qm.term, r.term) AS term,
                   CAST(floor((0.5 * coalesce(qm.ptq, 0.0)
                               + 0.5 * (CAST(coalesce(r.rm9, 0) AS DOUBLE) / 1000000000.0))
                              * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS weight
            FROM qm FULL OUTER JOIN rmtop r
              ON qm.query_id = r.query_id AND qm.term = r.term)
      SELECT query_id, term, weight,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY weight DESC, term) AS INTEGER) AS rank
      FROM u ORDER BY query_id, rank""",

    // q212: DuckDB's jaro_winkler_similarity implements the same standard
    // parameterization as the native expression (0.1 scaling, prefix 4,
    // 0.7 boost threshold — probed empirically); both sides quantize
    // through the scaled-floor gate.
    "q212_jaro_winkler" -> """
      WITH p AS (SELECT c_custkey, c_name,
                        CASE WHEN c_custkey % 3 = 0
                             THEN substring(c_name, 1, length(c_name) - 2)
                                  || substring(c_name, length(c_name), 1)
                                  || substring(c_name, length(c_name) - 1, 1)
                             WHEN c_custkey % 3 = 1
                             THEN 'K' || substring(c_name, 2, length(c_name) - 1)
                             ELSE c_name END AS variant
                 FROM customer),
      s AS (SELECT c_custkey, variant,
                   CAST(floor(jaro_winkler_similarity(c_name, variant)
                              * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS sim
            FROM p)
      SELECT c_custkey, variant, sim, (sim >= 0.99) AS is_match
      FROM s ORDER BY c_custkey""",

    // q213: the same u^(1/w) keys from the shared hash grid, quantized at
    // 1e-9, top-100 by (key desc, id) — TopKScored's exact rule.
    "q213_weighted_sample" -> s"""
      WITH s AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
                        CAST(floor(pow((CAST(${duckKeyHash("doc_id", "ws1")} AS DOUBLE) + 0.5)
                                       / 1152921504606846976.0,
                                       1.0 / CAST(n_chars AS DOUBLE))
                                   * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0 AS es_key
                 FROM documents WHERE n_chars > 0)
      SELECT doc_id, weight, es_key FROM s
      ORDER BY es_key DESC, doc_id LIMIT 100""",

    // q214: the q144 bin arithmetic per vintage, add-one smoothing, the
    // (pa-pb)·ln(pa/pb) contributions on the 1e-7 grid.
    "q214_psi" -> """
      WITH ha AS (SELECT ((greatest(CAST(0 AS BIGINT), least(CAST(2047 AS BIGINT),
                            CAST(n_chars AS BIGINT))) * 32) // 2048) AS bin,
                         count(*) AS ca
                  FROM documents WHERE doc_id % 2 = 0 GROUP BY bin),
      hb AS (SELECT ((greatest(CAST(0 AS BIGINT), least(CAST(2047 AS BIGINT),
                       CAST(n_chars * 2 AS BIGINT))) * 32) // 2048) AS bin,
                    count(*) AS cb
             FROM documents WHERE doc_id % 2 <> 0 GROUP BY bin),
      m AS (SELECT coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
            FROM ha FULL OUTER JOIN hb USING (bin)),
      t AS (SELECT sum(ca) AS ta, sum(cb) AS tb FROM m),
      p AS (SELECT CAST(ca + 1 AS DOUBLE) / CAST(ta + 32 AS DOUBLE) AS pa,
                   CAST(cb + 1 AS DOUBLE) / CAST(tb + 32 AS DOUBLE) AS pb
            FROM m CROSS JOIN t),
      c AS (SELECT CAST(floor((pa - pb) * ln(pa / pb) * 10000000.0 + 0.5) AS BIGINT) AS c7
            FROM p)
      SELECT CAST(floor(CAST(sum(c7) AS DOUBLE) / 10000000.0 * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS psi
      FROM c""",

    // q215: midranks via the cumulative window over distinct values, the
    // same exact half-integer arithmetic, tie correction and z mirrored.
    "q215_mann_whitney" -> """
      WITH a AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents WHERE doc_id % 2 = 0),
      b AS (SELECT CAST(n_chars + 50 AS DOUBLE) AS v FROM documents WHERE doc_id % 2 <> 0),
      ca AS (SELECT v, count(*) AS na FROM a GROUP BY v),
      cb AS (SELECT v, count(*) AS nb FROM b GROUP BY v),
      m AS (SELECT v, coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
            FROM ca FULL OUTER JOIN cb USING (v)),
      r AS (SELECT na, nb, na + nb AS t,
                   coalesce(sum(na + nb) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
            FROM m),
      mid AS (SELECT na, nb, t,
                     CAST(bef + 1 AS DOUBLE) + CAST(t - 1 AS DOUBLE) / 2.0 AS mid
              FROM r),
      ag AS (SELECT CAST(sum(na) AS BIGINT) AS sa, CAST(sum(nb) AS BIGINT) AS sb,
                    sum(CAST(na AS DOUBLE) * mid) AS ra,
                    sum(CAST(t AS DOUBLE) * CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
                        - CAST(t AS DOUBLE)) AS ties
             FROM mid),
      ua AS (SELECT sa, sb, ties,
                    ra - CAST(sa AS DOUBLE) * CAST(sa + 1 AS DOUBLE) / 2.0 AS u_a
             FROM ag)
      SELECT sa AS n_a, sb AS n_b, u_a,
             CASE WHEN CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) / 12.0 *
                       ((CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE) + 1.0)
                        - ties / ((CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE))
                                  * (CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE) - 1.0))) > 0.0
                  THEN CAST(floor((u_a - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) / 2.0)
                         / sqrt(CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) / 12.0 *
                                ((CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE) + 1.0)
                                 - ties / ((CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE))
                                           * (CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE) - 1.0))))
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS z
      FROM ua""",

    // q216: the same ascending (count, group) ranking and exact integer
    // sums; uniform groupings score exactly 0 by the closed form.
    "q216_gini" -> """
      WITH c AS (SELECT lang, count(*) AS x FROM documents GROUP BY lang),
      r AS (SELECT x, row_number() OVER (ORDER BY x, lang) AS i FROM c),
      a AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS tot,
                   CAST(sum(i * x) AS BIGINT) AS ix
            FROM r)
      SELECT n AS n_groups, tot AS total,
             CAST(floor((2.0 * CAST(ix AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
                         - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS gini
      FROM a""",

    // q217: the same per-value counts, cumulative ECDF window, and
    // exact |cumA·nB − cumB·nA| integer cross-products; d / ks / p
    // mirrored op for op on doubles.
    "q217_ks_test" -> """
      WITH a AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents WHERE doc_id % 2 = 0),
      b AS (SELECT CAST(n_chars * 2 AS DOUBLE) AS v FROM documents WHERE doc_id % 2 <> 0),
      ca AS (SELECT v, count(*) AS na FROM a GROUP BY v),
      cb AS (SELECT v, count(*) AS nb FROM b GROUP BY v),
      m AS (SELECT v, coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
            FROM ca FULL OUTER JOIN cb USING (v)),
      t AS (SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb FROM m),
      cum AS (SELECT sum(na) OVER w AS cca, sum(nb) OVER w AS ccb
              FROM m WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)),
      g AS (SELECT ta, tb, CAST(max(abs(cca * tb - ccb * ta)) AS BIGINT) AS mx
            FROM cum CROSS JOIN t GROUP BY ta, tb),
      s AS (SELECT ta, tb,
                   CAST(mx AS DOUBLE) / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)) AS d,
                   sqrt(CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)
                        / (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)))
                     * (CAST(mx AS DOUBLE) / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE))) AS ks
            FROM g)
      SELECT ta AS n_a, tb AS n_b,
             CAST(floor(d * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS d,
             CAST(floor(ks * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS ks_stat,
             CAST(floor(least(1.0, 2.0 * exp(-2.0 * ks * ks)) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS p_approx
      FROM s""",

    // q218: the synchronous min-label-tie LPA rounds unrolled CTE by CTE
    // (the q136 HITS discipline) over the same planted block graph.
    "q218_label_prop" -> lpaOracle(q218EdgeSql, iterations = 3),

    // q228: the q218 partition re-derived by the shared CTE builder, then
    // the exact-integer modularity identity.
    "q228_modularity" -> modularityOracle(q218EdgeSql, iterations = 3),

    // q226: DuckDB's ordered list aggregation + 1-based slice windows,
    // the same '>'-joined grams and min-count gate.
    "q226_event_ngrams" -> """
      WITH seq AS (SELECT user_id, list(event_type ORDER BY ts, event_id) AS ts_
                   FROM events GROUP BY user_id),
      g AS (SELECT array_to_string(ts_[CAST(i AS INTEGER):CAST(i AS INTEGER) + 2], '>') AS gram
            FROM (SELECT ts_, unnest(range(1, len(ts_) - 1)) AS i
                  FROM seq WHERE len(ts_) >= 3))
      SELECT gram, count(*) AS cnt FROM g GROUP BY gram
      HAVING count(*) >= 5 ORDER BY cnt DESC, gram""",

    // q227: the same windowed time-to-first-purchase subjects, at-risk
    // window, 1e-9 ln grid, and extinction flag.
    "q227_kaplan_meier" -> """
      WITH ev AS (SELECT user_id, event_type, CAST(ts AS DATE) AS dt FROM events
                  WHERE CAST(ts AS DATE) <= DATE '2024-01-03'),
      f AS (SELECT user_id, min(dt) AS start FROM ev GROUP BY user_id),
      p AS (SELECT user_id, min(dt) AS pd FROM ev WHERE event_type = 'purchase'
            GROUP BY user_id),
      subj AS (SELECT CASE WHEN pd IS NOT NULL THEN date_diff('day', start, pd)
                           ELSE date_diff('day', start, DATE '2024-01-03') END AS t,
                      (pd IS NOT NULL) AS o
               FROM f LEFT JOIN p USING (user_id)),
      pt AS (SELECT t, count(*) FILTER (WHERE o) AS d, count(*) AS al
             FROM subj GROUP BY t),
      tot AS (SELECT CAST(sum(al) AS BIGINT) AS n FROM pt),
      w AS (SELECT t, d, al,
                   n - coalesce(sum(al) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS risk
            FROM pt CROSS JOIN tot),
      l9 AS (SELECT t, d, risk,
                    CASE WHEN d < risk
                         THEN CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / CAST(risk AS DOUBLE))
                                         * 1000000000.0 + 0.5) AS BIGINT)
                         ELSE 0 END AS ln9,
                    CASE WHEN d = risk AND d > 0 THEN 1 ELSE 0 END AS died
             FROM w),
      cum AS (SELECT t, d, risk,
                     sum(ln9) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum9,
                     max(died) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
              FROM l9)
      SELECT t AS duration, CAST(risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS n_events,
             CASE WHEN dead = 1 THEN 0.0
                  ELSE CAST(floor(exp(CAST(cum9 AS DOUBLE) / 1000000000.0)
                                  * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS survival
      FROM cum WHERE d > 0 ORDER BY duration""",

    // q230/q231/q235: generated — hashSplit boundary / quantile /
    // permutation-coin mirrors.
    "q230_ab_readout" -> abReadoutOracle,
    "q231_rfm" -> rfmOracle,
    "q235_permutation_test" -> permutationOracle,
    "q237_welch_ttest" -> welchOracle,
    "q244_class_weights" -> classWeightsOracle,
    "q246_raking" -> rakingOracle,
    "q248_experiment_scorecard" -> scorecardOracle,
    "q249_silhouette" -> silhouetteOracle,
    "q251_fdr_segments" -> fdrSegmentsOracle,
    "q252_qte" -> qteOracle,
    "q253_log_rank" -> logRankOracle,
    "q255_brier" -> brierOracle,
    "q256_isotonic" -> isotonicOracle,
    "q257_calibrated_brier" -> calibratedBrierOracle,
    "q258_oos_calibration" -> oosCalibrationOracle,

    // q254: the q35 weight formula 1e-6-quantized to decimal, exact
    // decimal dots/norms, maxDf 50 candidate cap, thresholded top-50.
    "q254_tfidf_cosine" -> """
      WITH terms AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      w AS (SELECT tf.doc_id AS id, tf.term,
                   CAST(CAST(floor(tf.tf * ln(CAST((SELECT count(*) FROM documents)
                         AS DOUBLE) / CAST(dfreq.df AS DOUBLE))
                       * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
                     AS DECIMAL(18,6)) AS w
            FROM tf JOIN dfreq USING (term)
            WHERE dfreq.df <= 50),
      norms AS (SELECT id,
                       sqrt(CAST(CAST(sum(CAST(w * w AS DECIMAL(38,12)))
                           AS DECIMAL(38,12)) AS DOUBLE)) AS nrm
                FROM w GROUP BY id),
      pairs AS (SELECT l.id AS id_a, r.id AS id_b,
                       CAST(count(*) AS BIGINT) AS n_terms,
                       CAST(sum(CAST(l.w * r.w AS DECIMAL(38,12)))
                         AS DECIMAL(38,12)) AS dot
                FROM w l JOIN w r ON l.term = r.term AND l.id < r.id
                GROUP BY l.id, r.id),
      sim AS (SELECT id_a, id_b, n_terms,
                     CAST(floor(CAST(dot AS DOUBLE) / (na.nrm * nb.nrm)
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS cosine
              FROM pairs JOIN norms na ON pairs.id_a = na.id
                         JOIN norms nb ON pairs.id_b = nb.id)
      SELECT id_a, id_b, n_terms, cosine FROM sim WHERE cosine >= 0.3
      ORDER BY cosine DESC, id_a, id_b LIMIT 50""",

    // q250: exact S from the temporal pair join, tie-corrected variance,
    // continuity-corrected z.
    "q250_mann_kendall" -> """
      WITH daily AS (SELECT event_type AS g,
                            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
                            count(*) AS cnt
                     FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      b AS (SELECT g, t, CAST(cnt AS DECIMAL(18,2)) AS v FROM daily),
      sp AS (SELECT l.g AS g, CAST(sum(sign(r.v - l.v)) AS BIGINT) AS s_stat
             FROM b l JOIN b r ON l.g = r.g AND l.t < r.t GROUP BY l.g),
      tie AS (SELECT g,
                     CAST(sum(CAST(c * (c - 1) * (c * 2 + 5) AS DECIMAL(38,0)))
                       AS DECIMAL(38,0)) AS tt
              FROM (SELECT g, CAST(count(*) AS DECIMAL(12,0)) AS c
                    FROM b GROUP BY g, v) GROUP BY g),
      ns AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY g),
      j AS (SELECT ns.g, ns.n, coalesce(sp.s_stat, 0) AS s_stat,
                   CAST(CAST(CAST(ns.n AS DECIMAL(12,0))
                         * (CAST(ns.n AS DECIMAL(12,0)) - 1)
                         * (CAST(ns.n AS DECIMAL(12,0)) * 2 + 5) AS DECIMAL(38,0))
                       - tie.tt AS DOUBLE) / 18.0 AS var_s
            FROM ns LEFT JOIN sp ON ns.g = sp.g JOIN tie ON ns.g = tie.g)
      SELECT g AS event_type, n, s_stat,
             CAST(floor(var_s * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS var_s,
             CASE WHEN var_s > 0.0 THEN
               CASE WHEN s_stat > 0
                    THEN CAST(floor((CAST(s_stat AS DOUBLE) - 1.0) / sqrt(var_s)
                           * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
                    WHEN s_stat < 0
                    THEN CAST(floor((CAST(s_stat AS DOUBLE) + 1.0) / sqrt(var_s)
                           * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
                    ELSE 0.0 END
             END AS z
      FROM j ORDER BY event_type""",

    // q245: the total-order match rule — controls sort before treated at
    // equal score, ignore-nulls window picks, exact decimal distances,
    // prev on ties, caliper 5.00.
    "q245_matched_att" -> """
      WITH u AS (SELECT user_id, count(*) AS engagement,
                        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                          AS total_value,
                        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                          AS treated,
                        user_id % 4 AS cohort
                 FROM events GROUP BY user_id),
      b AS (SELECT cohort, user_id AS id, (treated = 1) AS t,
                   CAST(engagement AS DECIMAL(18,2)) AS s,
                   CAST(total_value AS DECIMAL(18,2)) AS y
            FROM u WHERE engagement IS NOT NULL AND total_value IS NOT NULL
              AND treated IS NOT NULL),
      w AS (SELECT cohort, id, t, s, y,
                   last_value(CASE WHEN NOT t THEN s END IGNORE NULLS) OVER pw AS ps,
                   last_value(CASE WHEN NOT t THEN y END IGNORE NULLS) OVER pw AS py,
                   first_value(CASE WHEN NOT t THEN s END IGNORE NULLS) OVER nw AS ns,
                   first_value(CASE WHEN NOT t THEN y END IGNORE NULLS) OVER nw AS ny
            FROM b
            WINDOW pw AS (PARTITION BY cohort ORDER BY s, CAST(t AS INT), id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   nw AS (PARTITION BY cohort ORDER BY s, CAST(t AS INT), id
                          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
      m AS (SELECT cohort, y,
                   CASE WHEN ps IS NOT NULL AND (ns IS NULL OR s - ps <= ns - s)
                        THEN s - ps ELSE ns - s END AS d,
                   CASE WHEN ps IS NOT NULL AND (ns IS NULL OR s - ps <= ns - s)
                        THEN py ELSE ny END AS my
            FROM w WHERE t),
      m2 AS (SELECT cohort, y, my,
                    (d IS NOT NULL AND d <= CAST(5.0 AS DECIMAL(18,2))) AS ok
             FROM m)
      SELECT cohort,
             CAST(count(*) AS BIGINT) AS n_treated,
             CAST(count(*) FILTER (WHERE ok) AS BIGINT) AS n_matched,
             CASE WHEN count(*) FILTER (WHERE ok) > 0
                  THEN CAST(floor(CAST(CAST(sum(y - my) FILTER (WHERE ok)
                           AS DECIMAL(38,8)) AS DOUBLE)
                         / CAST(count(*) FILTER (WHERE ok) AS DOUBLE)
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS att
      FROM m2 GROUP BY cohort ORDER BY cohort""",

    // q247: id-range bucket checkpoints, per-token first bucket, OLS on
    // 1e-9-quantized logs summed as decimal.
    "q247_heaps_law" -> """
      WITH bounds AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
      toks0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      toks AS (SELECT ((doc_id - lo) * 10) // (hi - lo + 1) AS b, tok
               FROM toks0 CROSS JOIN bounds WHERE len(tok) > 0),
      pb AS (SELECT b, CAST(count(*) AS BIGINT) AS nt FROM toks GROUP BY b),
      fb AS (SELECT b, CAST(count(*) AS BIGINT) AS nv
             FROM (SELECT tok, min(b) AS b FROM toks GROUP BY tok) GROUP BY b),
      cum AS (SELECT pb.b,
                     CAST(sum(nt) OVER cw AS BIGINT) AS cn,
                     CAST(sum(coalesce(nv, 0)) OVER cw AS BIGINT) AS cv
              FROM pb LEFT JOIN fb ON pb.b = fb.b
              WINDOW cw AS (ORDER BY pb.b
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      pts AS (SELECT
                CAST(CAST(floor(ln(CAST(cn AS DOUBLE)) * 1000000000.0 + 0.5)
                    AS DOUBLE) / 1000000000.0 AS DECIMAL(18,9)) AS x,
                CAST(CAST(floor(ln(CAST(cv AS DOUBLE)) * 1000000000.0 + 0.5)
                    AS DOUBLE) / 1000000000.0 AS DECIMAL(18,9)) AS y
              FROM cum WHERE cn > 0 AND cv > 0),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
                   CAST(sum(x) AS DECIMAL(38,9)) AS sx,
                   CAST(sum(y) AS DECIMAL(38,9)) AS sy,
                   CAST(sum(CAST(x * y AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS sxy,
                   CAST(sum(CAST(x * x AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS sxx
            FROM pts),
      f AS (SELECT n_points,
                   CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
                   (CAST(n_points AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n_points AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta,
                   sx, sy
            FROM s)
      SELECT n_points,
             CASE WHEN n_points >= 2 AND den <> 0.0
                  THEN CAST(floor(beta * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS beta,
             CASE WHEN n_points >= 2 AND den <> 0.0
                  THEN CAST(floor(exp((CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE))
                         / CAST(n_points AS DOUBLE)) * 1000000.0 + 0.5) AS DOUBLE)
                    / 1000000.0
             END AS k
      FROM f""",

    // q236: doubled average ranks (2·minrank + ties − 1, exact integers)
    // then the pearson closed form on exact decimal rank sums.
    "q236_spearman" -> """
      WITH c AS (SELECT l_returnflag AS g,
                        CAST(l_quantity AS DECIMAL(18,2)) AS x,
                        CAST(l_extendedprice AS DECIMAL(18,2)) AS y
                 FROM lineitem
                 WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      r AS (SELECT g,
                   CAST(2 * rank() OVER (PARTITION BY g ORDER BY x)
                        + count(*) OVER (PARTITION BY g, x) - 1 AS DECIMAL(18,0)) AS rx,
                   CAST(2 * rank() OVER (PARTITION BY g ORDER BY y)
                        + count(*) OVER (PARTITION BY g, y) - 1 AS DECIMAL(18,0)) AS ry
            FROM c),
      s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(rx) AS DECIMAL(38,0)) AS sx,
                   CAST(sum(ry) AS DECIMAL(38,0)) AS sy,
                   CAST(sum(CAST(rx * ry AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
                   CAST(sum(CAST(rx * rx AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
                   CAST(sum(CAST(ry * ry AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy
            FROM r GROUP BY g)
      SELECT g AS l_returnflag, n,
             CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
                   AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
                  THEN CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS rho
      FROM s ORDER BY l_returnflag""",

    // q238: per-group exact (n, Σx, Σx²), the between-groups Σ S²/n with
    // each term 1e-6-quantized then decimal-summed (the operator's
    // order-independence contract), F from the double closed form.
    "q238_anova" -> """
      WITH c AS (SELECT event_type AS g, CAST(value AS DECIMAL(18,2)) AS x
                 FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
      per AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS DECIMAL(38,8)) AS s,
                     CAST(sum(CAST(x * x AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS ss
              FROM c GROUP BY g),
      p2 AS (SELECT *,
                    CAST(CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                        / CAST(n AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
                      / 1000000.0 AS DECIMAL(38,6)) AS term
             FROM per),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
                     CAST(sum(s) AS DECIMAL(38,8)) AS gs,
                     CAST(sum(ss) AS DECIMAL(38,8)) AS gss,
                     CAST(sum(term) AS DECIMAL(38,6)) AS sqn
              FROM p2),
      f AS (SELECT k, n,
                   greatest(CAST(sqn AS DOUBLE)
                       - CAST(gs AS DOUBLE) * CAST(gs AS DOUBLE)
                         / CAST(n AS DOUBLE), 0.0) AS ssb,
                   CAST(gss AS DOUBLE) - CAST(sqn AS DOUBLE) AS ssw
            FROM tot)
      SELECT k, n,
             CAST(floor(ssb * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS ss_between,
             CAST(floor(ssw * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS ss_within,
             CASE WHEN k >= 2 AND CAST(n AS DOUBLE) - CAST(k AS DOUBLE) > 0.0
                   AND ssw > 0.0
                  THEN CAST(floor((ssb / (CAST(k AS DOUBLE) - 1.0))
                         / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS f_stat
      FROM f""",

    // q239: the capPerKey 150-row sample (k smallest event_ids per type),
    // then exact pair counting with the tie-corrected tau-b denominator.
    "q239_kendall_tau" -> """
      WITH e AS (SELECT event_type AS g, event_id AS id,
                        CAST(value AS DECIMAL(18,2)) AS x,
                        CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                             AS DECIMAL(18,2)) AS y
                 FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
      capped AS (SELECT g, id, x, y FROM (
                   SELECT *, row_number() OVER (PARTITION BY g ORDER BY id) AS rn
                   FROM e) WHERE rn <= 150),
      p AS (SELECT a.g AS g, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by2
            FROM capped a JOIN capped b ON a.g = b.g AND a.id < b.id),
      cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS n_pairs,
                     CAST(count(*) FILTER (WHERE (ax < bx AND ay < by2)
                       OR (ax > bx AND ay > by2)) AS BIGINT) AS concordant,
                     CAST(count(*) FILTER (WHERE (ax < bx AND ay > by2)
                       OR (ax > bx AND ay < by2)) AS BIGINT) AS discordant,
                     CAST(count(*) FILTER (WHERE ax = bx AND ay <> by2) AS BIGINT) AS tx,
                     CAST(count(*) FILTER (WHERE ay = by2 AND ax <> bx) AS BIGINT) AS ty
              FROM p GROUP BY g),
      ns AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM capped GROUP BY g)
      SELECT ns.g AS event_type, n,
             coalesce(n_pairs, 0) AS n_pairs,
             coalesce(concordant, 0) AS concordant,
             coalesce(discordant, 0) AS discordant,
             CASE WHEN CAST(concordant AS DOUBLE) + CAST(discordant AS DOUBLE)
                         + CAST(ty AS DOUBLE) > 0.0
                   AND CAST(concordant AS DOUBLE) + CAST(discordant AS DOUBLE)
                         + CAST(tx AS DOUBLE) > 0.0
                  THEN CAST(floor((CAST(concordant AS DOUBLE) - CAST(discordant AS DOUBLE))
                         / sqrt((CAST(concordant AS DOUBLE) + CAST(discordant AS DOUBLE)
                                 + CAST(ty AS DOUBLE))
                                * (CAST(concordant AS DOUBLE) + CAST(discordant AS DOUBLE)
                                   + CAST(tx AS DOUBLE)))
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS tau_b
      FROM ns LEFT JOIN cnt ON ns.g = cnt.g ORDER BY event_type""",

    // q240: unit-level exact decimal sums, leave-one-out pseudo-values
    // 1e-9-quantized then decimal-summed (the operator's contract).
    "q240_ratio_jackknife" -> """
      WITH u AS (SELECT event_type AS g, user_id,
                        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y,
                        CAST(count(*) AS DECIMAL(18,2)) AS x
                 FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      w AS (SELECT g, y, x,
                   CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n,
                   CAST(sum(y) OVER (PARTITION BY g) AS DECIMAL(38,8)) AS sy,
                   CAST(sum(x) OVER (PARTITION BY g) AS DECIMAL(38,8)) AS sx
            FROM u),
      r AS (SELECT g, n, sy, sx,
                   CASE WHEN sx - x = 0 THEN 1 ELSE 0 END AS bad,
                   CASE WHEN sx - x <> 0
                        THEN CAST(CAST(floor(CAST(sy - y AS DOUBLE)
                               / CAST(sx - x AS DOUBLE) * 1000000000.0 + 0.5) AS DOUBLE)
                             / 1000000000.0 AS DECIMAL(18,9))
                        ELSE CAST(0 AS DECIMAL(18,9)) END AS ti
            FROM w),
      a AS (SELECT g, max(n) AS n, max(sy) AS gy, max(sx) AS gx,
                   CAST(sum(bad) AS BIGINT) AS nbad,
                   CAST(sum(ti) AS DECIMAL(38,9)) AS st,
                   CAST(sum(CAST(ti * ti AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS stt
            FROM r GROUP BY g)
      SELECT g AS event_type, n,
             CASE WHEN gx <> 0
                  THEN CAST(floor(CAST(gy AS DOUBLE) / CAST(gx AS DOUBLE)
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS theta,
             CASE WHEN n >= 2 AND nbad = 0 AND gx <> 0
                  THEN CAST(floor(sqrt(greatest(CAST(stt AS DOUBLE)
                           - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE),
                           0.0)
                         * (CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE))
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS se_jack
      FROM a ORDER BY event_type""",

    // q241: wedges at each shared neighbor (deg <= 1024), per-z 1/ln(deg)
    // 1e-9-quantized then decimal-summed, anti-join against the edge set,
    // exact-decimal top-20.
    "q241_adamic_adar" -> """
      WITH raw AS (SELECT doc_id % 100 AS s, (doc_id * 31 + 7) % 100 AS d FROM documents),
      und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
              FROM raw WHERE s <> d),
      deg AS (SELECT n AS node, CAST(count(*) AS BIGINT) AS degree
              FROM (SELECT a AS n FROM und UNION ALL SELECT b FROM und) GROUP BY n),
      nbr AS (SELECT t.z, t.nbr,
                     CAST(CAST(floor(1.0 / ln(CAST(degree AS DOUBLE))
                         * 1000000000.0 + 0.5) AS DOUBLE)
                       / 1000000000.0 AS DECIMAL(18,9)) AS term
              FROM (SELECT a AS z, b AS nbr FROM und
                    UNION ALL SELECT b AS z, a AS nbr FROM und) t
              JOIN deg ON t.z = deg.node
              WHERE degree >= 2 AND degree <= 1024),
      w AS (SELECT l.nbr AS a, r.nbr AS b, l.term AS term
            FROM nbr l JOIN nbr r ON l.z = r.z AND l.nbr < r.nbr),
      sc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS common_neighbors,
                    CAST(sum(term) AS DECIMAL(38,9)) AS aa
             FROM w GROUP BY a, b),
      missing AS (SELECT sc.a, sc.b, sc.common_neighbors, sc.aa
                  FROM sc LEFT JOIN und ON sc.a = und.a AND sc.b = und.b
                  WHERE und.a IS NULL)
      SELECT a AS node_a, b AS node_b, common_neighbors,
             CAST(floor(CAST(aa AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS adamic_adar
      FROM missing ORDER BY aa DESC, a, b LIMIT 20""",

    // q242: exact decimal prefix sums per key, per-split two-sided SSE in
    // doubles, earliest-time argmin.
    "q242_changepoint" -> """
      WITH daily AS (SELECT event_type AS g,
                            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS t,
                            count(*) AS cnt
                     FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      b AS (SELECT g, t, CAST(cnt AS DECIMAL(18,2)) AS v FROM daily),
      w AS (SELECT g, t,
                   CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n,
                   CAST(sum(v) OVER (PARTITION BY g) AS DECIMAL(38,8)) AS s,
                   CAST(sum(CAST(v * v AS DECIMAL(38,8)))
                     OVER (PARTITION BY g) AS DECIMAL(38,8)) AS ss,
                   CAST(count(*) OVER cw AS BIGINT) AS nl,
                   CAST(sum(v) OVER cw AS DECIMAL(38,8)) AS sl,
                   CAST(sum(CAST(v * v AS DECIMAL(38,8))) OVER cw AS DECIMAL(38,8)) AS ssl
            FROM b
            WINDOW cw AS (PARTITION BY g ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      cand AS (SELECT *,
                      (CAST(ssl AS DOUBLE) - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
                         / CAST(nl AS DOUBLE))
                      + (CAST(ss AS DOUBLE) - CAST(ssl AS DOUBLE)
                         - (CAST(s AS DOUBLE) - CAST(sl AS DOUBLE))
                           * (CAST(s AS DOUBLE) - CAST(sl AS DOUBLE))
                           / CAST(n - nl AS DOUBLE)) AS cost
               FROM w WHERE n >= 4 AND nl >= 1 AND nl < n),
      best AS (SELECT * FROM (
                 SELECT *, row_number() OVER (PARTITION BY g ORDER BY cost, t) AS rn
                 FROM cand) WHERE rn = 1)
      SELECT g AS event_type, n, t AS split_t,
             CAST(floor((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS sse_total,
             CAST(floor(cost * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS sse_split,
             CASE WHEN CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n AS DOUBLE) > 0.0
                  THEN CAST(floor((1.0 - cost / (CAST(ss AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                         * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS drop_frac
      FROM best ORDER BY event_type""",

    // q243: centered 7-row trend (full windows only), per-phase seasonal
    // means over 1e-6-quantized detrended values summed as decimal.
    "q243_stl" -> """
      WITH daily AS (SELECT event_type AS g,
                            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
                            count(*) AS cnt
                     FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      b AS (SELECT g, day, CAST(cnt AS DECIMAL(18,2)) AS v FROM daily),
      w AS (SELECT g, day, v,
                   CAST(count(*) OVER cw AS BIGINT) AS wn,
                   CAST(sum(v) OVER cw AS DECIMAL(38,8)) AS ws
            FROM b
            WINDOW cw AS (PARTITION BY g ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      tr AS (SELECT g, day, v,
                    CASE WHEN wn = 7
                         THEN CAST(floor(CAST(ws AS DOUBLE) / 7.0 * 1000000.0 + 0.5)
                                AS DOUBLE) / 1000000.0
                    END AS trend
             FROM w),
      dt AS (SELECT *,
                    CAST(floor((CAST(v AS DOUBLE) - trend) * 1000000.0 + 0.5) AS DOUBLE)
                      / 1000000.0 AS detr,
                    day % 7 AS phase
             FROM tr),
      seas AS (SELECT g, phase,
                      CAST(floor(CAST(sum(CAST(detr AS DECIMAL(18,6))) AS DOUBLE)
                          / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
                        / 1000000.0 AS seasonal
               FROM dt WHERE trend IS NOT NULL GROUP BY g, phase)
      SELECT dt.g AS event_type, dt.day, CAST(dt.v AS DOUBLE) AS value, dt.trend,
             CASE WHEN dt.trend IS NOT NULL THEN seas.seasonal END AS seasonal,
             CASE WHEN dt.trend IS NOT NULL
                  THEN CAST(floor((dt.detr - seas.seasonal) * 1000000.0 + 0.5) AS DOUBLE)
                    / 1000000.0
             END AS remainder
      FROM dt LEFT JOIN seas ON dt.g = seas.g AND dt.phase = seas.phase
      ORDER BY event_type, day""",

    // q232: the same planted corruption, decimal(18,2)->decimal(38,2)
    // sums, violation filter, and status classes.
    "q232_reconcile" -> """
      WITH a AS (SELECT l_orderkey AS key,
                        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sa
                 FROM lineitem GROUP BY 1),
      b AS (SELECT l_orderkey AS key,
                   CAST(sum(CAST(CASE WHEN l_orderkey % 500 = 0 AND l_linenumber = 1
                                      THEN l_quantity + 1 ELSE l_quantity END
                            AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sb
            FROM lineitem WHERE NOT (l_orderkey % 1000 = 0 AND l_linenumber = 1)
            GROUP BY 1),
      m AS (SELECT key, sa, sb FROM a FULL OUTER JOIN b USING (key)
            WHERE sa IS NULL OR sb IS NULL OR sa <> sb)
      SELECT key, CAST(sa AS DOUBLE) AS sum_a, CAST(sb AS DOUBLE) AS sum_b,
             CAST(coalesce(sa, 0) - coalesce(sb, 0) AS DOUBLE) AS delta,
             CASE WHEN sa IS NULL THEN 'missing_a'
                  WHEN sb IS NULL THEN 'missing_b'
                  ELSE 'mismatch' END AS status
      FROM m ORDER BY key""",

    // q233: q195's decimal sufficient statistics, the population
    // variance/covariance forms, and theta/rho^2 mirrored raw-then-
    // quantized.
    "q233_cuped" -> """
      WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS dt FROM events),
      pre AS (SELECT user_id, count(*) AS pre FROM ev
              WHERE dt < DATE '2024-01-16' GROUP BY user_id),
      post AS (SELECT user_id, count(*) AS post FROM ev
               WHERE dt >= DATE '2024-01-16' GROUP BY user_id),
      u AS (SELECT coalesce(pre, 0) AS x, coalesce(post, 0) AS y
            FROM pre FULL OUTER JOIN post USING (user_id)),
      s AS (SELECT count(*) AS n,
                   CAST(sum(CAST(x AS DECIMAL(18,2))) AS DECIMAL(38,8)) AS sx,
                   CAST(sum(CAST(y AS DECIMAL(18,2))) AS DECIMAL(38,8)) AS sy,
                   sum(CAST(CAST(x AS DECIMAL(18,2)) *
                            CAST(y AS DECIMAL(18,2)) AS DECIMAL(38,8))) AS sxy,
                   sum(CAST(CAST(x AS DECIMAL(18,2)) *
                            CAST(x AS DECIMAL(18,2)) AS DECIMAL(38,8))) AS sxx,
                   sum(CAST(CAST(y AS DECIMAL(18,2)) *
                            CAST(y AS DECIMAL(18,2)) AS DECIMAL(38,8))) AS syy
            FROM u),
      v AS (SELECT n,
                   (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS vx,
                   (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS vy,
                   (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS cv
            FROM s)
      SELECT n,
             CASE WHEN vx > 0.0
                  THEN CAST(floor(cv / vx * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS theta,
             CAST(floor(vy * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS var_y,
             CASE WHEN vx > 0.0
                  THEN CAST(floor((vy - cv * cv / vx) * 1000000.0 + 0.5) AS DOUBLE)
                       / 1000000.0
             END AS var_adj,
             CASE WHEN vx > 0.0 AND vy > 0.0
                  THEN CAST(floor(cv * cv / vx / vy * 1000000.0 + 0.5) AS DOUBLE)
                       / 1000000.0
             END AS var_reduction
      FROM v""",

    // q234: the same two keyed aggregations and summary bars.
    "q234_privacy_audit" -> """
      WITH s AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
                 FROM customer GROUP BY 1, 2),
      dv AS (SELECT c_nationkey, c_mktsegment, count(*) AS ld
             FROM (SELECT DISTINCT c_nationkey, c_mktsegment, c_acctbal FROM customer)
             GROUP BY 1, 2)
      SELECT CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_groups,
             CAST(min(n) AS BIGINT) AS min_group_size,
             CAST(count(*) FILTER (WHERE n < 5) AS BIGINT) AS groups_below_k,
             CAST(coalesce(sum(n) FILTER (WHERE n < 5), 0) AS BIGINT) AS rows_below_k,
             CAST(min(ld) AS BIGINT) AS min_l_diversity,
             CAST(count(*) FILTER (WHERE ld < 3) AS BIGINT) AS groups_below_l
      FROM s JOIN dv USING (c_nationkey, c_mktsegment)""",

    // q229: the plain exact phi-frequent query — the MG candidate pass is
    // an implementation detail the determinism contract hides.
    "q229_heavy_hitters" -> """
      WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      n AS (SELECT count(*) AS n FROM t),
      c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok)
      SELECT tok, CAST(cnt AS BIGINT) AS cnt,
             CAST(floor(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS share
      FROM c CROSS JOIN n WHERE cnt * 200 > n ORDER BY cnt DESC, tok""",

    // q219: the same pair self-join, 1e-9 slope grid, (s9, x1, x2) rank
    // order, and two-middle-rank average; integer ranks via //.
    "q219_theil_sen" -> """
      WITH daily AS (SELECT event_type,
                            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
                            count(*) AS cnt
                     FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      pts AS (SELECT event_type AS k, CAST(day AS DOUBLE) AS x, CAST(cnt AS DOUBLE) AS y
              FROM daily),
      np AS (SELECT k, count(*) AS n_points FROM pts GROUP BY k),
      pr AS (SELECT p1.k, p1.x AS x1, p2.x AS x2,
                    CAST(floor((p2.y - p1.y) / (p2.x - p1.x) * 1000000000.0 + 0.5)
                         AS BIGINT) AS s9
             FROM pts p1 JOIN pts p2 ON p1.k = p2.k AND p1.x < p2.x),
      r AS (SELECT k, s9, x1, x2, count(*) OVER (PARTITION BY k) AS n,
                   row_number() OVER (PARTITION BY k ORDER BY s9, x1, x2) AS rn
            FROM pr),
      med AS (SELECT k, CAST(max(n) AS BIGINT) AS n_pairs,
                     CAST(sum(s9) AS BIGINT) AS ms, count(*) AS mc
              FROM r WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1 GROUP BY k),
      s AS (SELECT k, n_pairs,
                   CAST(floor(CAST(ms AS DOUBLE) / CAST(mc AS DOUBLE) / 1000000000.0
                              * 1000000000.0 + 0.5) AS DOUBLE) / 1000000000.0 AS slope
            FROM med)
      SELECT np.k AS event_type, np.n_points,
             coalesce(s.n_pairs, 0) AS n_pairs, s.slope
      FROM np LEFT JOIN s USING (k) ORDER BY event_type""",

    // q220: the same pre/post hourly counts, distinct-date day counts,
    // and exact-integer per-day-rate ratio with the lo/hi band flags.
    "q220_seasonal_baseline" -> """
      WITH e AS (SELECT event_type AS k, ts FROM events WHERE ts IS NOT NULL),
      pre AS (SELECT * FROM e WHERE ts < TIMESTAMP '2024-01-04'),
      post AS (SELECT * FROM e WHERE ts >= TIMESTAMP '2024-01-04'),
      ps AS (SELECT k, EXTRACT(hour FROM ts) AS hour, count(*) AS pre_cnt
             FROM pre GROUP BY 1, 2),
      qs AS (SELECT k, EXTRACT(hour FROM ts) AS hour, count(*) AS post_cnt
             FROM post GROUP BY 1, 2),
      pd AS (SELECT count(DISTINCT CAST(ts AS DATE)) AS pdays FROM pre),
      qd AS (SELECT count(DISTINCT CAST(ts AS DATE)) AS qdays FROM post),
      m AS (SELECT k, hour, coalesce(pre_cnt, 0) AS pre_cnt,
                   coalesce(post_cnt, 0) AS post_cnt
            FROM ps FULL OUTER JOIN qs USING (k, hour))
      SELECT k AS event_type, hour,
             CAST(pre_cnt AS BIGINT) AS pre_cnt, CAST(post_cnt AS BIGINT) AS post_cnt,
             CAST(floor(CAST(pre_cnt AS DOUBLE) / CAST(pdays AS DOUBLE)
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS expected_rate,
             CAST(floor(CAST(post_cnt AS DOUBLE) / CAST(qdays AS DOUBLE)
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS actual_rate,
             CASE WHEN pre_cnt > 0
                  THEN CAST(floor(CAST(post_cnt * pdays AS DOUBLE)
                                  / CAST(pre_cnt * qdays AS DOUBLE)
                                  * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS ratio,
             (pre_cnt = 0 OR
              (pre_cnt > 0 AND
               (CAST(post_cnt * pdays AS DOUBLE) < CAST(pre_cnt * qdays AS DOUBLE) * 0.5 OR
                CAST(post_cnt * pdays AS DOUBLE) > CAST(pre_cnt * qdays AS DOUBLE) * 2.0)))
               AS anomalous
      FROM m CROSS JOIN pd CROSS JOIN qd
      ORDER BY event_type, hour""",

    // q221: q208's rater-B CASE verbatim, the three-rater UNION matrix,
    // and the coincidence identity on the same 1e-9 per-unit grid.
    "q221_krippendorff" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      h AS (SELECT doc_id,
                   len(list_filter(w, x -> x IN ('der','die','das','und','ist'))) AS de_hits,
                   len(list_filter(w, x -> x IN ('the','a','of','and','is'))) AS en_hits,
                   len(list_filter(w, x -> x IN ('el','la','de','y','es'))) AS es_hits
            FROM toks),
      det AS (SELECT doc_id,
                     CASE WHEN de_hits >= en_hits AND de_hits >= es_hits THEN 'de'
                          WHEN en_hits >= es_hits THEN 'en'
                          ELSE 'es' END AS a
              FROM h),
      ratings AS (SELECT doc_id AS u, lang AS c FROM documents
                  UNION ALL SELECT doc_id, a FROM det
                  UNION ALL SELECT doc_id,
                                   CASE WHEN doc_id % 7 = 0 THEN 'en' ELSE lang END
                            FROM documents WHERE doc_id % 3 <> 0),
      base AS (SELECT u, c FROM ratings WHERE c IS NOT NULL),
      uc AS (SELECT u, c, count(*) AS nuc FROM base GROUP BY u, c),
      pu AS (SELECT u, CAST(sum(nuc) AS BIGINT) AS m,
                    CAST(sum(nuc * (nuc - 1)) AS BIGINT) AS same
             FROM uc GROUP BY u HAVING sum(nuc) >= 2),
      pud AS (SELECT u, CAST(floor(CAST(m * (m - 1) - same AS DOUBLE)
                                   / CAST(m - 1 AS DOUBLE)
                                   * 1000000000.0 + 0.5) AS BIGINT) AS dis9
              FROM pu),
      marg AS (SELECT CAST(sum(nc) AS BIGINT) AS n, CAST(sum(nc * nc) AS BIGINT) AS sq
               FROM (SELECT c, sum(nuc) AS nc
                     FROM uc JOIN pud USING (u) GROUP BY c)),
      o AS (SELECT count(*) AS n_units, CAST(sum(dis9) AS BIGINT) AS do9 FROM pud)
      SELECT o.n_units, marg.n AS n_ratings,
             CAST(floor(CAST(do9 AS DOUBLE) / 1000000000.0 / CAST(n AS DOUBLE)
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS do_rate,
             CAST(floor((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(sq AS DOUBLE))
                        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS de_rate,
             CASE WHEN sq = n * n THEN NULL
                  ELSE CAST(floor((1.0 - (CAST(do9 AS DOUBLE) / 1000000000.0
                                          / CAST(n AS DOUBLE))
                                   / ((CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                                       - CAST(sq AS DOUBLE))
                                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))
                                  * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS alpha
      FROM o CROSS JOIN marg""",

    // q222: q215's midrank machinery specialized to the AUC identity;
    // gini_index derived from the QUANTIZED auc, mirroring the operator.
    "q222_auc" -> """
      WITH t AS (SELECT CAST(n_chars AS DOUBLE) AS v, (lang = 'en') AS y FROM documents
                 WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
      c AS (SELECT v, count(*) FILTER (WHERE y) AS np,
                   count(*) FILTER (WHERE NOT y) AS nn
            FROM t GROUP BY v),
      r AS (SELECT np, nn, np + nn AS tt,
                   coalesce(sum(np + nn) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
            FROM c),
      mid AS (SELECT np, nn,
                     CAST(bef + 1 AS DOUBLE) + CAST(tt - 1 AS DOUBLE) / 2.0 AS mid
              FROM r),
      ag AS (SELECT CAST(sum(np) AS BIGINT) AS sp, CAST(sum(nn) AS BIGINT) AS sn,
                    sum(CAST(np AS DOUBLE) * mid) AS rp
             FROM mid),
      a AS (SELECT sp AS n_pos, sn AS n_neg,
                   CASE WHEN sp > 0 AND sn > 0
                        THEN CAST(floor((rp - CAST(sp AS DOUBLE) * CAST(sp + 1 AS DOUBLE) / 2.0)
                                        / (CAST(sp AS DOUBLE) * CAST(sn AS DOUBLE))
                                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
                   END AS auc
            FROM ag)
      SELECT n_pos, n_neg, auc,
             CASE WHEN auc IS NOT NULL
                  THEN CAST(floor((2.0 * auc - 1.0) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS gini_index
      FROM a""",

    // q223: the same contingency counts, 1e-9 per-cell MI / chi-square /
    // entropy grids, and the identical raw-then-quantized ratios.
    "q223_mutual_info" -> """
      WITH b AS (SELECT CAST(lang AS VARCHAR) AS x, CAST(source AS VARCHAR) AS y
                 FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL),
      xy AS (SELECT x, y, count(*) AS nxy FROM b GROUP BY x, y),
      mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM xy GROUP BY x),
      my AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM xy GROUP BY y),
      tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM xy),
      cards AS (SELECT (SELECT count(*) FROM mx) AS cx, (SELECT count(*) FROM my) AS cy),
      cell AS (SELECT CAST(sum(CAST(floor(CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)
                        * ln(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)
                             / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))
                        * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS mi9,
                   CAST(sum(CAST(floor((CAST(nxy AS DOUBLE)
                          - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(nxy AS DOUBLE)
                           - CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))
                        / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))
                        * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS chi9,
                   CAST(sum(CAST(floor(CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)
                        / CAST(n AS DOUBLE)
                        * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS e9
              FROM xy JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot),
      hx AS (SELECT CAST(sum(CAST(floor(-(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE))
                       * ln(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE))
                       * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hx9
             FROM mx CROSS JOIN tot),
      hy AS (SELECT CAST(sum(CAST(floor(-(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))
                       * ln(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))
                       * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hy9
             FROM my CROSS JOIN tot)
      SELECT n, cx AS card_x, cy AS card_y,
             CAST(floor(CAST(mi9 AS DOUBLE) / 1000000000.0 * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS mi,
             CASE WHEN hx9 > 0 AND hy9 > 0
                  THEN CAST(floor(CAST(mi9 AS DOUBLE) / 1000000000.0
                                  / sqrt((CAST(hx9 AS DOUBLE) / 1000000000.0)
                                         * (CAST(hy9 AS DOUBLE) / 1000000000.0))
                                  * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS nmi,
             CASE WHEN least(cx, cy) > 1
                  THEN CAST(floor(sqrt((CAST(chi9 AS DOUBLE) / 1000000000.0
                                        + (CAST(n AS DOUBLE)
                                           - CAST(e9 AS DOUBLE) / 1000000000.0))
                                       / (CAST(n AS DOUBLE)
                                          * CAST(least(cx, cy) - 1 AS DOUBLE)))
                                  * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS cramers_v
      FROM tot CROSS JOIN cards CROSS JOIN cell CROSS JOIN hx CROSS JOIN hy""",

    // q224: the lag self-join over the q219 daily frame, then q195's
    // decimal sufficient-statistics Pearson mirrored per (type, lag).
    "q224_acf" -> """
      WITH daily AS (SELECT event_type,
                            date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
                            count(*) AS cnt
                     FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      pts AS (SELECT event_type AS k, CAST(day AS BIGINT) AS x, CAST(cnt AS DOUBLE) AS y
              FROM daily),
      lags AS (SELECT CAST(unnest(range(1, 8)) AS INTEGER) AS lag),
      pairs AS (SELECT a.k, l.lag, a.y AS ya, b.y AS yb
                FROM pts a CROSS JOIN lags l
                JOIN pts b ON b.k = a.k AND b.x = a.x + l.lag),
      s AS (SELECT k, lag, count(*) AS n,
                   CAST(sum(CAST(ya AS DECIMAL(18,2))) AS DECIMAL(38,8)) AS sx,
                   CAST(sum(CAST(yb AS DECIMAL(18,2))) AS DECIMAL(38,8)) AS sy,
                   sum(CAST(CAST(ya AS DECIMAL(18,2)) *
                            CAST(yb AS DECIMAL(18,2)) AS DECIMAL(38,8))) AS sxy,
                   sum(CAST(CAST(ya AS DECIMAL(18,2)) *
                            CAST(ya AS DECIMAL(18,2)) AS DECIMAL(38,8))) AS sxx,
                   sum(CAST(CAST(yb AS DECIMAL(18,2)) *
                            CAST(yb AS DECIMAL(18,2)) AS DECIMAL(38,8))) AS syy
            FROM pairs GROUP BY k, lag),
      d AS (SELECT k, lag, n,
                   CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
                   CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
                   CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num
            FROM s)
      SELECT k AS event_type, lag, n,
             CASE WHEN vx > 0.0 AND vy > 0.0
                  THEN CAST(floor(num / sqrt(vx * vy) * 1000000.0 + 0.5) AS DOUBLE)
                       / 1000000.0
             END AS r
      FROM d ORDER BY event_type, lag""",

    // q225: generated from the SAME cumulative-Poisson literals and
    // alpha/2 double the operator folds over (Double.toString round-trip).
    "q225_bootstrap_ci" -> bootstrapCiOracle,

    // q211: the same max-anchored pow(2, -age/halfLife) per event on the
    // 1e-9 grid; halfLife seconds written as the exact double literal.
    "q211_decayed_counts" -> """
      WITH r AS (SELECT max(epoch_us(ts)) AS ref FROM events),
      c AS (SELECT event_type,
                   CAST(floor(pow(2.0, -(CAST(r.ref - epoch_us(ts) AS DOUBLE)
                                         / 1000000.0 / 604800.0))
                              * 1000000000.0 + 0.5) AS BIGINT) AS c9
            FROM events CROSS JOIN r)
      SELECT event_type, count(*) AS n_events,
             CAST(floor(CAST(sum(c9) AS DOUBLE) / 1000000000.0 * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS decayed_count
      FROM c GROUP BY event_type ORDER BY event_type""",

    // q208: q28's lang-id CASE as rater A vs the lang column; kappa's
    // ratios mirrored raw-then-quantized, pe via the class-marginal join.
    "q208_cohen_kappa" -> """
      WITH t AS (SELECT source AS slice, lang, string_split(text, ' ') AS w FROM documents),
      h AS (SELECT slice, lang,
                   len(list_filter(w, x -> x IN ('der','die','das','und','ist'))) AS de_hits,
                   len(list_filter(w, x -> x IN ('the','a','of','and','is'))) AS en_hits,
                   len(list_filter(w, x -> x IN ('el','la','de','y','es'))) AS es_hits
            FROM t),
      det AS (SELECT slice, lang,
                     CASE WHEN de_hits >= en_hits AND de_hits >= es_hits THEN 'de'
                          WHEN en_hits >= es_hits THEN 'en'
                          ELSE 'es' END AS a
              FROM h),
      tot AS (SELECT slice, count(*) AS n,
                     count(*) FILTER (WHERE a = lang) AS agree
              FROM det GROUP BY slice),
      ca AS (SELECT slice, a AS cls, count(*) AS c FROM det GROUP BY slice, a),
      cb AS (SELECT slice, lang AS cls, count(*) AS c FROM det GROUP BY slice, lang),
      pe AS (SELECT ca.slice, sum(ca.c * cb.c) AS pn
             FROM ca JOIN cb ON ca.slice = cb.slice AND ca.cls = cb.cls
             GROUP BY ca.slice),
      r AS (SELECT tot.slice, tot.n,
                   CAST(tot.agree AS DOUBLE) / CAST(tot.n AS DOUBLE) AS po_r,
                   CAST(coalesce(pe.pn, 0) AS DOUBLE) /
                     (CAST(tot.n AS DOUBLE) * CAST(tot.n AS DOUBLE)) AS pe_r
            FROM tot LEFT JOIN pe ON tot.slice = pe.slice)
      SELECT slice, n,
             CAST(floor(po_r * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS po,
             CAST(floor(pe_r * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS pe,
             CASE WHEN pe_r = 1.0 THEN NULL
                  ELSE CAST(floor((po_r - pe_r) / (1.0 - pe_r) * 1000000.0 + 0.5) AS DOUBLE)
                       / 1000000.0 END AS kappa
      FROM r ORDER BY slice""",

    // q203: q92's score expression verbatim, then the binning/grid
    // aggregation mirrored op for op.
    "q203_reliability_card" -> s"""
      WITH $qualityScoreCtes,
      b AS (SELECT least(greatest(CAST(floor(s * 10) AS BIGINT), 0), 9) AS bin,
                   CAST(floor(s * 10000000.0 + 0.5) AS BIGINT) AS c7,
                   (lang = 'en') AS y
            FROM sc),
      agg AS (SELECT bin, count(*) AS n, sum(c7) AS s7,
                     count(*) FILTER (WHERE y) AS pos
              FROM b GROUP BY bin),
      card AS (SELECT bin, n,
                      CAST(floor(CAST(s7 AS DOUBLE) / 10000000.0 / CAST(n AS DOUBLE)
                                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS mean_score,
                      CAST(floor(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
                                 * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS frac_pos
               FROM agg)
      SELECT bin, n, mean_score, frac_pos,
             CAST(floor(abs(mean_score - frac_pos) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS abs_gap
      FROM card ORDER BY bin""",

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

    // q207: integer-grid per-dimension centroid sums re-derived via a
    // 64-row dimension unnest, then the identical cosine/flag projection.
    "q207_centroid_outliers" -> """
      WITH e AS (SELECT vec_id, CAST(vec_id % 4 AS VARCHAR) AS grp,
                        CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
      q AS (SELECT vec_id, grp,
                   list_transform(v, x -> CAST(floor(x * 10000000.0 + 0.5) AS BIGINT)) AS ql
            FROM e),
      dims AS (SELECT grp, d, sum(ql[d]) AS s
               FROM q CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS d) dd
               GROUP BY grp, d),
      cn AS (SELECT grp, count(*) AS n FROM e GROUP BY grp),
      cent AS (SELECT dims.grp,
                      list(CAST(s AS DOUBLE) / 10000000.0 / n ORDER BY d) AS c
               FROM dims JOIN cn USING (grp) GROUP BY dims.grp, n),
      sc AS (SELECT vec_id, e.grp,
                    CAST(floor((CASE WHEN sqrt(list_inner_product(v, v)) > 0
                                      AND sqrt(list_inner_product(c, c)) > 0
                                     THEN list_inner_product(v, c) /
                                          (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(c, c)))
                                     ELSE 0.0 END) * 1000000.0 + 0.5) AS DOUBLE)
                      / 1000000.0 AS cos_centroid
             FROM e JOIN cent ON e.grp = cent.grp)
      SELECT vec_id, grp, cos_centroid, (cos_centroid < 0.2) AS is_outlier
      FROM sc ORDER BY vec_id""",
    "q106_jl_project" -> jlProjectOracle,
    "q107_jl_ann" -> jlAnnOracle,
    "q51_hash_sample" -> hashSampleOracle,
    "q190_coordinated_sample" -> coordinatedSampleOracle,
    "q52_hash_split" -> hashSplitOracle,
    "q53_stratified_sample" -> stratifiedSampleOracle,
    "q54_mix_corpora" -> mixCorporaOracle,
    "q56_chunking" -> chunkingOracle,
    "q60_packing" -> packingOracle,
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

    // q137's classifier with the runner-up margin: same rank profiles,
    // top-2 distances per doc instead of the argmin alone.
    "q199_langid_margin" -> """
      WITH tr AS (SELECT lang, lower(text) AS t FROM documents WHERE doc_id % 2 = 0),
      trg AS (SELECT lang, substring(t, CAST(i AS INTEGER), 3) AS gram
              FROM (SELECT lang, t, unnest(range(1, len(t) - 1)) AS i
                    FROM tr WHERE len(t) >= 3)),
      pc AS (SELECT lang, gram, count(*) AS c FROM trg GROUP BY lang, gram),
      prof AS (SELECT lang, gram, rank FROM (
                 SELECT lang, gram,
                        row_number() OVER (PARTITION BY lang ORDER BY c DESC, gram) AS rank
                 FROM pc) WHERE rank <= 20),
      od AS (SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id % 2 = 1),
      og AS (SELECT doc_id, substring(t, CAST(i AS INTEGER), 3) AS gram
             FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
                   FROM od WHERE len(t) >= 3)),
      oc AS (SELECT doc_id, gram, count(*) AS c FROM og GROUP BY doc_id, gram),
      dp AS (SELECT doc_id, gram, drank FROM (
               SELECT doc_id, gram,
                      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS drank
               FROM oc) WHERE drank <= 20),
      langs AS (SELECT DISTINCT lang FROM prof),
      dist AS (SELECT dp.doc_id, l.lang,
                      CAST(sum(coalesce(abs(dp.drank - prof.rank), 20)) AS BIGINT) AS dist
               FROM dp CROSS JOIN langs l
                    LEFT JOIN prof ON prof.lang = l.lang AND prof.gram = dp.gram
               GROUP BY dp.doc_id, l.lang),
      ranked AS (SELECT doc_id, lang, dist,
                        row_number() OVER (PARTITION BY doc_id ORDER BY dist, lang) AS rn,
                        lead(dist) OVER (PARTITION BY doc_id ORDER BY dist, lang) AS nxt
                 FROM dist)
      SELECT doc_id, lang AS pred_lang, dist, nxt - dist AS margin
      FROM ranked WHERE rn = 1 ORDER BY doc_id""",

    "q200_id_gaps" -> """
      WITH ids AS (SELECT event_id FROM events WHERE event_id % 97 <> 0),
      w AS (SELECT event_id, lag(event_id) OVER (ORDER BY event_id) AS prev FROM ids)
      SELECT prev + 1 AS gap_start, event_id - 1 AS gap_end,
             event_id - prev - 1 AS missing
      FROM w WHERE prev IS NOT NULL AND event_id - prev > 1
      ORDER BY gap_start""",

    "q201_grouping_id" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             count(*) AS cnt,
             CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY gid, l_returnflag, l_linestatus""",

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

    // from-scratch SCD2 over ALL events — the incremental merge must be
    // indistinguishable from replaying history (q151's oracle).
    "q197_scd2_merge" -> """
      WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER w AS prev,
               row_number() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      changes AS (
        SELECT user_id, ts, event_id, event_type FROM ordered
        WHERE rn = 1 OR event_type IS DISTINCT FROM prev)
      SELECT user_id, event_type AS value, ts AS effective_from,
             lead(ts) OVER w2 AS effective_to,
             row_number() OVER w2 AS version
      FROM changes
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, version""",

    // q117's trained scorer chained into decile thresholds and lift.
    "q198_score_lift" -> """
      WITH toksl AS (SELECT lang = 'en' AS pos, unnest(string_split(text, ' ')) AS t
                     FROM documents),
      b AS (SELECT pos,
                   CAST(CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) % 64
                        AS INTEGER) AS bucket
            FROM toksl),
      c AS (SELECT bucket,
                   sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cpos,
                   sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS cneg
            FROM b GROUP BY bucket),
      tot AS (SELECT sum(cpos) AS tpos, sum(cneg) AS tneg FROM c),
      dom AS (SELECT unnest(range(0, 64)) AS bucket),
      w AS (SELECT CAST(dom.bucket AS INTEGER) AS bucket,
                   round(ln((coalesce(c.cpos, 0) + 1.0) / (tot.tpos + 64.0)) -
                         ln((coalesce(c.cneg, 0) + 1.0) / (tot.tneg + 64.0)), 6) AS wt
            FROM dom LEFT JOIN c USING (bucket) CROSS JOIN tot),
      wl AS (SELECT list(wt ORDER BY bucket) AS wl FROM w),
      prior AS (SELECT round(ln(
                  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) /
                  sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)), 6) AS bias
                FROM documents),
      toks AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
      scored AS (
        SELECT doc_id, lang = 'en' AS pos,
               round(1.0 / (1.0 + exp(-(
                 list_reduce(
                   list_prepend(prior.bias,
                     list_transform(tk, t -> wl.wl[
                       CAST(CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) % 64
                            AS INTEGER) + 1])),
                   (acc, x) -> acc + x)))), 4) AS q
        FROM toks CROSS JOIN wl CROSS JOIN prior),
      cuts AS (SELECT quantile_cont(q, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS t
               FROM scored),
      dec AS (SELECT 1 + len(list_filter(cuts.t, x -> scored.q > x)) AS decile, pos
              FROM scored CROSS JOIN cuts),
      agg AS (SELECT decile, count(*) AS n,
                     CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
              FROM dec GROUP BY decile),
      t2 AS (SELECT CAST(sum(n) AS DOUBLE) AS t, CAST(sum(n_pos) AS DOUBLE) AS tp FROM agg)
      SELECT CAST(decile AS INTEGER) AS decile, CAST(n AS BIGINT) AS n, n_pos,
             CAST(floor(n_pos / CAST(n AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS pos_rate,
             CAST(floor((n_pos / CAST(n AS DOUBLE)) / (t2.tp / t2.t)
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS lift
      FROM agg CROSS JOIN t2 ORDER BY decile""",

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

    "q195_corr" -> """
      WITH s AS (
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,8)) AS sx,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,8)) AS sy,
               sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
                        CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,8))) AS sxy,
               sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
                        CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,8))) AS sxx,
               sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,8))) AS syy
        FROM lineitem GROUP BY l_returnflag),
      d AS (SELECT l_returnflag, n,
                   CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
                   CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
                   CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num
            FROM s)
      SELECT l_returnflag, n,
             CASE WHEN vx > 0.0 AND vy > 0.0
                  THEN CAST(floor(num / sqrt(vx * vy) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             END AS r
      FROM d ORDER BY l_returnflag""",

    "q26_ann_topk" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 10),
      s AS (SELECT probe_id, e.vec_id AS nbr_id, list_cosine_similarity(pv, e.v) AS sim
            FROM p CROSS JOIN e WHERE e.vec_id != probe_id),
      r AS (SELECT probe_id, nbr_id, sim,
                   row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, nbr_id) AS rnk
            FROM s)
      SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, nbr_id, round(sim, 4) + 0.0 AS cos_sim
      FROM r WHERE rnk <= 5 ORDER BY probe_id, rnk""",

    "q27_text_quality" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      SELECT doc_id,
             CAST(len(w) AS INTEGER) AS token_cnt,
             CAST(len(list_distinct(w)) AS INTEGER) AS distinct_cnt,
             CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS avg_token_len,
             CAST(len(list_filter(w, x -> x IN ('the','a','of','and','is'))) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS stop_ratio,
             CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS distinct_ratio
      FROM t ORDER BY doc_id""",

    "q28_lang_id" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      h AS (SELECT doc_id,
                   CAST(len(list_filter(w, x -> x IN ('der','die','das','und','ist'))) AS INTEGER) AS de_hits,
                   CAST(len(list_filter(w, x -> x IN ('the','a','of','and','is'))) AS INTEGER) AS en_hits,
                   CAST(len(list_filter(w, x -> x IN ('el','la','de','y','es'))) AS INTEGER) AS es_hits
            FROM t)
      SELECT doc_id, de_hits, en_hits, es_hits,
             CASE WHEN de_hits >= en_hits AND de_hits >= es_hits THEN 'de'
                  WHEN en_hits >= es_hits THEN 'en'
                  ELSE 'es' END AS detected
      FROM h ORDER BY doc_id""",

    "q29_token_counts" -> """
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
             CAST(len(regexp_extract_all(text, '[a-z]{1,4}|[0-9]{1,4}')) AS INTEGER) AS subword_tokens
      FROM documents ORDER BY doc_id""",

    "q30_fingerprint" -> """
      WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(w, x -> CAST(concat('0x', substring(md5(x), 1, 6)) AS BIGINT))),
               (acc, h) -> (acc * 131 + h) % 1000000007) AS fp_rolling,
             md5(text) AS fp_md5
      FROM t ORDER BY doc_id""",

    "q31_cosine_pairs" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
      ORDER BY id_a, id_b""",

    // q48 must EQUAL the exact all-pairs answer (recall 1 at these band
    // parameters on this corpus; precision 1 by construction), so its
    // oracle is q31's verbatim.
    "q48_cosine_pairs_lsh" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
      ORDER BY id_a, id_b""",

    "q35_tfidf" -> """
      WITH terms AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
               tf.tf * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) AS tfidf
        FROM tf JOIN dfreq USING (term)),
      ranked AS (
        SELECT doc_id, term, tf, df, tfidf,
               row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
        FROM scored)
      SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, term, tf, df, round(tfidf, 4) AS tfidf
      FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""",

    "q36_salted_agg" -> """
      SELECT l_returnflag, count(*) AS cnt,
             CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

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

    "q40_ann_ivf" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      asgn AS (
        SELECT e.vec_id, e.v, cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_cosine_similarity(e.v, cv) DESC, cid) AS rn
        FROM e CROSS JOIN c),
      cell AS (SELECT vec_id, v, cid AS cell FROM asgn WHERE rn = 1),
      p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 10),
      pcell AS (
        SELECT probe_id, pv, cid AS cell,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY list_cosine_similarity(pv, cv) DESC, cid) AS rn
        FROM p CROSS JOIN c),
      cand AS (
        SELECT probe_id, pv, vec_id AS nbr_id, v
        FROM (SELECT probe_id, pv, cell FROM pcell WHERE rn <= 4) pc
        JOIN cell USING (cell)
        WHERE vec_id != probe_id),
      scored AS (
        SELECT probe_id, nbr_id, list_cosine_similarity(pv, v) AS sim,
               row_number() OVER (PARTITION BY probe_id ORDER BY list_cosine_similarity(pv, v) DESC, nbr_id) AS rnk
        FROM cand)
      SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, nbr_id, round(sim, 4) + 0.0 AS cos_sim
      FROM scored WHERE rnk <= 5 ORDER BY probe_id, rnk""",

    "q41_multimodal_probe" -> """
      SELECT doc_id AS media_id,
             CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
             md5(text) AS fp_md5,
             substring(hex(encode(text)), 1, 16) AS head_hex
      FROM documents ORDER BY media_id""",

    // Rebuilds the DECODED pixel grid closed-form (the synthetic generator
    // formula), then mirrors the Spark luminance kernel's exact double
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
      px AS (
        SELECT i.media_id, k.k,
               CASE WHEN i.pert AND k.k = 0
                    THEN 1 + ((1 + ((i.seed+1)*(k.k+2) % 257) % 255) - 1 + 8) % 255
                    ELSE 1 + ((i.seed+1)*(k.k+2) % 257) % 255 END AS g
        FROM imgs i, (SELECT unnest(range(0, 64)) AS k) k),
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

    // (1.2 + 1.0) instead of the literal 2.2: both engines then derive the
    // k1+1 factor through the SAME double addition the Spark side computes,
    // instead of trusting decimal-literal parsing to agree with it.
    "q87_bm25_topk" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf
             FROM (SELECT doc_id, unnest(w) AS term FROM toks) GROUP BY doc_id, term),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      corpus AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                        CAST(avg(len(w)) AS DOUBLE) AS avgdl FROM toks),
      dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM toks),
      queries(query_id, qtext) AS (VALUES
        (CAST(1 AS BIGINT), 'batch join'),
        (CAST(2 AS BIGINT), 'customer query table'),
        (CAST(3 AS BIGINT), 'nosuchterm')),
      qterms AS (SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS term
                 FROM queries),
      scored AS (
        SELECT q.query_id, tf.doc_id,
               sum( ln(1 + (c.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                    * (tf.tf * (1.2 + 1.0))
                    / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / c.avgdl)) ) AS score
        FROM tf JOIN qterms q USING (term) JOIN dfreq USING (term)
             JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN corpus c
        GROUP BY q.query_id, tf.doc_id),
      ranked AS (
        SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
        FROM scored)
      SELECT query_id, doc_id, round(score, 4) AS score
      FROM ranked WHERE rnk <= 10 ORDER BY query_id, doc_id""",

    // q87's BM25 CTEs with quantized-selection ranking (round BEFORE the
    // top-k cut, ties to doc_id — the scoreScale=4 contract), then the
    // metric definitions verbatim: recall = hits/nrel, MRR = max(1/rnk)
    // over hits, nDCG = dcg/idcg with linear gains and the ideal ranking
    // (rel desc, doc_id) truncated at k.
    "q113_retrieval_eval" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf
             FROM (SELECT doc_id, unnest(w) AS term FROM toks) GROUP BY doc_id, term),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      corpus AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                        CAST(avg(len(w)) AS DOUBLE) AS avgdl FROM toks),
      dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM toks),
      queries(query_id, qtext) AS (VALUES
        (CAST(1 AS BIGINT), 'batch join'),
        (CAST(2 AS BIGINT), 'customer query table'),
        (CAST(3 AS BIGINT), 'nosuchterm')),
      qterms AS (SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS term
                 FROM queries),
      scored AS (
        SELECT q.query_id, tf.doc_id,
               round(sum( ln(1 + (c.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                    * (tf.tf * (1.2 + 1.0))
                    / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / c.avgdl)) ), 4) AS score
        FROM tf JOIN qterms q USING (term) JOIN dfreq USING (term)
             JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN corpus c
        GROUP BY q.query_id, tf.doc_id),
      topk AS (
        SELECT query_id, doc_id, rnk FROM (
          SELECT query_id, doc_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
          FROM scored) WHERE rnk <= 10),
      qr AS (SELECT f.query_id, t.doc_id,
                    least(len(list_filter(string_split(t.text, ' '), x -> x = f.term)), 3) AS rel
             FROM documents t
             CROSS JOIN (SELECT query_id, string_split(qtext, ' ')[1] AS term FROM queries) f
             WHERE len(list_filter(string_split(t.text, ' '), x -> x = f.term)) > 0),
      j AS (SELECT k.query_id, k.rnk, coalesce(qr.rel, 0) AS rel
            FROM topk k LEFT JOIN qr ON k.query_id = qr.query_id AND k.doc_id = qr.doc_id),
      pq AS (SELECT query_id,
                    sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS hits,
                    max(CASE WHEN rel > 0 THEN 1.0 / rnk ELSE 0.0 END) AS mrr,
                    sum(CASE WHEN rel > 0 THEN rel / log2(rnk + 1) ELSE 0.0 END) AS dcg
             FROM j GROUP BY query_id),
      ide AS (SELECT query_id, count(*) AS nrel,
                     sum(CASE WHEN irank <= 10 THEN rel / log2(irank + 1) ELSE 0.0 END) AS idcg
              FROM (SELECT query_id, rel, doc_id,
                           row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id) AS irank
                    FROM qr) GROUP BY query_id)
      SELECT p.query_id,
             round(CAST(p.hits AS DOUBLE) / ide.nrel, 6) AS recall_at_k,
             round(p.mrr, 6) AS mrr_at_k,
             round(CASE WHEN ide.idcg > 0 THEN p.dcg / ide.idcg ELSE 0.0 END, 6) AS ndcg_at_k
      FROM pq p LEFT JOIN ide USING (query_id) ORDER BY p.query_id""",

    // Same literal fold map (interpolated from the operator's constants),
    // same order: lower -> translate -> collapse ('g' = global, Spark's
    // default) -> trim. The planted prefix carries a real tab.
    "q115_normalize" -> s"""
      SELECT doc_id,
             trim(regexp_replace(
               translate(lower('HÉLLO  WÖRLD ÀÉÎÕÜ façade œuvre${"\t"}' || text),
                         '${graft.operators.TextAnalysis.AccentFrom}',
                         '${graft.operators.TextAnalysis.AccentTo}'),
               '${"\\s+"}', ' ', 'g')) AS norm
      FROM documents ORDER BY doc_id""",

    "q116_nb_train" -> """
      WITH toks AS (SELECT lang = 'en' AS pos, unnest(string_split(text, ' ')) AS t
                    FROM documents),
      b AS (SELECT pos,
                   CAST(CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) % 64
                        AS INTEGER) AS bucket
            FROM toks),
      c AS (SELECT bucket,
                   sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cpos,
                   sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS cneg
            FROM b GROUP BY bucket),
      tot AS (SELECT sum(cpos) AS tpos, sum(cneg) AS tneg FROM c),
      dom AS (SELECT unnest(range(0, 64)) AS bucket)
      SELECT CAST(dom.bucket AS INTEGER) AS bucket,
             CAST(coalesce(c.cpos, 0) AS BIGINT) AS cpos,
             CAST(coalesce(c.cneg, 0) AS BIGINT) AS cneg,
             round(ln((coalesce(c.cpos, 0) + 1.0) / (tot.tpos + 64.0)) -
                   ln((coalesce(c.cneg, 0) + 1.0) / (tot.tneg + 64.0)), 6) + 0.0 AS weight
      FROM dom LEFT JOIN c USING (bucket) CROSS JOIN tot
      ORDER BY bucket""",

    "q117_nb_quality" -> """
      WITH toksl AS (SELECT lang = 'en' AS pos, unnest(string_split(text, ' ')) AS t
                     FROM documents),
      b AS (SELECT pos,
                   CAST(CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) % 64
                        AS INTEGER) AS bucket
            FROM toksl),
      c AS (SELECT bucket,
                   sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cpos,
                   sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS cneg
            FROM b GROUP BY bucket),
      tot AS (SELECT sum(cpos) AS tpos, sum(cneg) AS tneg FROM c),
      dom AS (SELECT unnest(range(0, 64)) AS bucket),
      w AS (SELECT CAST(dom.bucket AS INTEGER) AS bucket,
                   round(ln((coalesce(c.cpos, 0) + 1.0) / (tot.tpos + 64.0)) -
                         ln((coalesce(c.cneg, 0) + 1.0) / (tot.tneg + 64.0)), 6) AS wt
            FROM dom LEFT JOIN c USING (bucket) CROSS JOIN tot),
      wl AS (SELECT list(wt ORDER BY bucket) AS wl FROM w),
      prior AS (SELECT round(ln(
                  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) /
                  sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)), 6) AS bias
                FROM documents),
      toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
      SELECT doc_id,
             round(1.0 / (1.0 + exp(-(
               list_reduce(
                 list_prepend(prior.bias,
                   list_transform(tk, t -> wl.wl[
                     CAST(CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) % 64
                          AS INTEGER) + 1])),
                 (acc, x) -> acc + x)))), 4) AS quality_score
      FROM toks CROSS JOIN wl CROSS JOIN prior ORDER BY doc_id""",

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

    "q95_bigram_ppl" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      bg AS (
        SELECT doc_id, w[p] AS w1, w[p + 1] AS w2
        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS p
              FROM toks WHERE len(w) >= 2)),
      c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
      c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
      v AS (SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v
            FROM (SELECT unnest(w) AS t FROM toks)),
      scored AS (
        SELECT bg.doc_id, count(*) AS n_bigrams,
               exp(-avg(ln((coalesce(c12.c12, 0) + 1.0) /
                           (coalesce(c1.c1, 0) + 1.0 * v.v)))) AS ppl
        FROM bg LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1)
             CROSS JOIN v
        GROUP BY bg.doc_id)
      SELECT d.doc_id,
             CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             round(s.ppl, 4) AS ppl
      FROM documents d LEFT JOIN scored s USING (doc_id)
      ORDER BY d.doc_id""",

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

    "q93_kmeans_train" -> s"""
      WITH $kmeansCtes,
      a3 AS (SELECT vec_id, cid FROM (
               SELECT e.vec_id, c.cid,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
               FROM e CROSS JOIN c2 c) WHERE rn = 1),
      sz AS (SELECT cid, count(*) AS size FROM a3 GROUP BY cid)
      SELECT c2.cid, d.i - 1 AS dim, round(c2.cv[d.i], 4) + 0.0 AS cval,
             coalesce(sz.size, 0) AS size
      FROM c2 CROSS JOIN dims d LEFT JOIN sz USING (cid)
      ORDER BY c2.cid, dim""",

    "q90_rrf_fusion" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf
             FROM (SELECT doc_id, unnest(w) AS term FROM toks) GROUP BY doc_id, term),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      corpus AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                        CAST(avg(len(w)) AS DOUBLE) AS avgdl FROM toks),
      dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM toks),
      queries(query_id, qtext) AS (VALUES
        (CAST(1 AS BIGINT), 'batch join'),
        (CAST(2 AS BIGINT), 'customer query table')),
      qterms AS (SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS term
                 FROM queries),
      scored AS (
        SELECT q.query_id, tf.doc_id,
               sum( ln(1 + (c.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                    * (tf.tf * (1.2 + 1.0))
                    / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / c.avgdl)) ) AS score_a,
               sum( ln(1 + (c.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                    * (tf.tf * (1.2 + 1.0))
                    / (tf.tf + 1.2 * (1.0 + 0.0 * dl.dl / c.avgdl)) ) AS score_b
        FROM tf JOIN qterms q USING (term) JOIN dfreq USING (term)
             JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN corpus c
        GROUP BY q.query_id, tf.doc_id),
      ranked AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY round(score_a, 4) DESC, doc_id) AS ra,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY round(score_b, 4) DESC, doc_id) AS rb
        FROM scored),
      contribs AS (
        SELECT query_id, doc_id, 1.0 / (60 + ra) AS c FROM ranked WHERE ra <= 20
        UNION ALL
        SELECT query_id, doc_id, 1.0 / (60 + rb) AS c FROM ranked WHERE rb <= 20),
      fused AS (SELECT query_id, doc_id, sum(c) AS rrf
                FROM contribs GROUP BY query_id, doc_id),
      topk AS (SELECT query_id, doc_id, rrf,
                      row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rnk
               FROM fused)
      SELECT query_id, doc_id, round(rrf, 6) AS rrf_score
      FROM topk WHERE rnk <= 10 ORDER BY query_id, doc_id""",

    "q96_semdedup_trained" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      dims AS (SELECT unnest(range(1, 65)) AS i),
      c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
             FROM e ORDER BY vec_id LIMIT 4),
      a1 AS (SELECT vec_id, cid FROM (
               SELECT e.vec_id, c.cid,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
               FROM e CROSS JOIN c0 c) WHERE rn = 1),
      m1 AS (SELECT a.cid, d.i, avg(e.v[d.i]) AS x
             FROM a1 a JOIN e USING (vec_id) CROSS JOIN dims d GROUP BY a.cid, d.i),
      c1 AS (SELECT c0.cid, coalesce(mm.cv, c0.cv) AS cv
             FROM c0 LEFT JOIN (SELECT cid, list(x ORDER BY i) AS cv
                                FROM m1 GROUP BY cid) mm USING (cid)),
      a2 AS (SELECT vec_id, cid FROM (
               SELECT e.vec_id, c.cid,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
               FROM e CROSS JOIN c1 c) WHERE rn = 1),
      m2 AS (SELECT a.cid, d.i, avg(e.v[d.i]) AS x
             FROM a2 a JOIN e USING (vec_id) CROSS JOIN dims d GROUP BY a.cid, d.i),
      c2 AS (SELECT c1.cid, coalesce(mm.cv, c1.cv) AS cv
             FROM c1 LEFT JOIN (SELECT cid, list(x ORDER BY i) AS cv
                                FROM m2 GROUP BY cid) mm USING (cid)),
      assign AS (SELECT vec_id, cid FROM (
               SELECT e.vec_id, c.cid,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
               FROM e CROSS JOIN c2 c) WHERE rn = 1),
      dropped AS (
        SELECT DISTINCT b.vec_id
        FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
             JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
        WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.3)
      SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster,
             (a.vec_id NOT IN (SELECT vec_id FROM dropped)) AS kept
      FROM assign a ORDER BY a.vec_id""",

    "q97_rrf_dense" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf
             FROM (SELECT doc_id, unnest(w) AS term FROM toks) GROUP BY doc_id, term),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      corpus AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                        CAST(avg(len(w)) AS DOUBLE) AS avgdl FROM toks),
      dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM toks),
      queries(query_id, qtext) AS (VALUES
        (CAST(1 AS BIGINT), 'batch join'),
        (CAST(2 AS BIGINT), 'customer query table')),
      qterms AS (SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS term
                 FROM queries),
      scored AS (
        SELECT q.query_id, tf.doc_id,
               sum( ln(1 + (c.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                    * (tf.tf * (1.2 + 1.0))
                    / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / c.avgdl)) ) AS score_a,
               sum( ln(1 + (c.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                    * (tf.tf * (1.2 + 1.0))
                    / (tf.tf + 1.2 * (1.0 + 0.0 * dl.dl / c.avgdl)) ) AS score_b
        FROM tf JOIN qterms q USING (term) JOIN dfreq USING (term)
             JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN corpus c
        GROUP BY q.query_id, tf.doc_id),
      ranked AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY round(score_a, 4) DESC, doc_id) AS ra,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY round(score_b, 4) DESC, doc_id) AS rb
        FROM scored),
      emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      probes AS (SELECT vec_id AS query_id, v AS p FROM emb WHERE vec_id IN (1, 2)),
      dense AS (
        SELECT pr.query_id, e.vec_id AS doc_id,
               row_number() OVER (PARTITION BY pr.query_id
                 ORDER BY round(list_cosine_similarity(e.v, pr.p), 4) DESC, e.vec_id) AS rc
        FROM emb e JOIN probes pr ON e.vec_id != pr.query_id),
      contribs AS (
        SELECT query_id, doc_id, 1.0 / (60 + ra) AS c FROM ranked WHERE ra <= 20
        UNION ALL
        SELECT query_id, doc_id, 1.0 / (60 + rb) AS c FROM ranked WHERE rb <= 20
        UNION ALL
        SELECT query_id, doc_id, 1.0 / (60 + rc) AS c FROM dense WHERE rc <= 20),
      fused AS (SELECT query_id, doc_id, sum(c) AS rrf
                FROM contribs GROUP BY query_id, doc_id),
      topk AS (SELECT query_id, doc_id, rrf,
                      row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rnk
               FROM fused)
      SELECT query_id, doc_id, round(rrf, 6) AS rrf_score
      FROM topk WHERE rnk <= 10 ORDER BY query_id, doc_id""",

    "q98_bigram_ppl_heldout" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      bg_train AS (
        SELECT w[p] AS w1, w[p + 1] AS w2
        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS p
              FROM toks WHERE len(w) >= 2 AND doc_id % 2 = 0)),
      c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg_train GROUP BY w1, w2),
      c1 AS (SELECT w1, count(*) AS c1 FROM bg_train GROUP BY w1),
      v AS (SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v
            FROM (SELECT unnest(w) AS t FROM toks WHERE doc_id % 2 = 0)),
      bg AS (
        SELECT doc_id, w[p] AS w1, w[p + 1] AS w2
        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS p
              FROM toks WHERE len(w) >= 2 AND doc_id % 2 = 1)),
      scored AS (
        SELECT bg.doc_id, count(*) AS n_bigrams,
               exp(-avg(ln((coalesce(c12.c12, 0) + 1.0) /
                           (coalesce(c1.c1, 0) + 1.0 * v.v)))) AS ppl
        FROM bg LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1)
             CROSS JOIN v
        GROUP BY bg.doc_id)
      SELECT d.doc_id,
             CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             round(s.ppl, 4) AS ppl
      FROM documents d LEFT JOIN scored s USING (doc_id)
      WHERE d.doc_id % 2 = 1
      ORDER BY d.doc_id""",

    "q99_kmeans_farthest" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      dims AS (SELECT unnest(range(1, 65)) AS i),
      s0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
      b1 AS (SELECT e.vec_id, max(list_cosine_similarity(e.v, c.v)) AS best
             FROM e CROSS JOIN s0 c GROUP BY e.vec_id),
      s1 AS (SELECT b.vec_id, e.v FROM b1 b JOIN e USING (vec_id)
             ORDER BY b.best, b.vec_id LIMIT 1),
      ch1 AS (SELECT * FROM s0 UNION ALL SELECT * FROM s1),
      b2 AS (SELECT e.vec_id, max(list_cosine_similarity(e.v, c.v)) AS best
             FROM e CROSS JOIN ch1 c GROUP BY e.vec_id),
      s2 AS (SELECT b.vec_id, e.v FROM b2 b JOIN e USING (vec_id)
             ORDER BY b.best, b.vec_id LIMIT 1),
      ch2 AS (SELECT * FROM ch1 UNION ALL SELECT * FROM s2),
      b3 AS (SELECT e.vec_id, max(list_cosine_similarity(e.v, c.v)) AS best
             FROM e CROSS JOIN ch2 c GROUP BY e.vec_id),
      s3 AS (SELECT b.vec_id, e.v FROM b3 b JOIN e USING (vec_id)
             ORDER BY b.best, b.vec_id LIMIT 1),
      cents AS (
        SELECT CAST(0 AS BIGINT) AS cid, v FROM s0
        UNION ALL SELECT 1, v FROM s1
        UNION ALL SELECT 2, v FROM s2
        UNION ALL SELECT 3, v FROM s3),
      assign AS (SELECT vec_id, cid FROM (
               SELECT e.vec_id, c.cid,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY list_cosine_similarity(e.v, c.v) DESC, c.cid) AS rn
               FROM e CROSS JOIN cents c) WHERE rn = 1),
      sz AS (SELECT cid, count(*) AS size FROM assign GROUP BY cid)
      SELECT c.cid, d.i - 1 AS dim, round(c.v[d.i], 4) + 0.0 AS cval,
             coalesce(sz.size, 0) AS size
      FROM cents c CROSS JOIN dims d LEFT JOIN sz USING (cid)
      ORDER BY c.cid, dim""",

    // Unrolls trainBpe's two merge iterations: the same word split, the
    // same |s1||s2| wrapped representation, the same (count DESC, pair ASC)
    // argmax, the same left-to-right replace — all integer counts, so the
    // merges agree symbol for symbol.
    "q100_bpe_train" -> """
      WITH words AS (
        SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
          SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
          FROM documents)
        WHERE len(w) > 0 GROUP BY w),
      r0 AS (SELECT regexp_replace(w, '(.)', '|\1|', 'g') AS rep, wc FROM words),
      t1 AS (SELECT string_split(trim(rep, '|'), '||') AS t, wc FROM r0),
      p1 AS (SELECT t[p] AS l_sym, t[p+1] AS r_sym, CAST(sum(wc) AS BIGINT) AS pair_count
             FROM (SELECT t, wc, unnest(generate_series(1, len(t) - 1)) AS p
                   FROM t1 WHERE len(t) >= 2)
             GROUP BY 1, 2),
      b1 AS (SELECT l_sym, r_sym, pair_count FROM p1
             ORDER BY pair_count DESC, l_sym, r_sym LIMIT 1),
      r1 AS (SELECT replace(rep,
               '|' || (SELECT l_sym FROM b1) || '||' || (SELECT r_sym FROM b1) || '|',
               '|' || (SELECT l_sym FROM b1) || (SELECT r_sym FROM b1) || '|') AS rep, wc
             FROM r0),
      t2 AS (SELECT string_split(trim(rep, '|'), '||') AS t, wc FROM r1),
      p2 AS (SELECT t[p] AS l_sym, t[p+1] AS r_sym, CAST(sum(wc) AS BIGINT) AS pair_count
             FROM (SELECT t, wc, unnest(generate_series(1, len(t) - 1)) AS p
                   FROM t2 WHERE len(t) >= 2)
             GROUP BY 1, 2),
      b2 AS (SELECT l_sym, r_sym, pair_count FROM p2
             ORDER BY pair_count DESC, l_sym, r_sym LIMIT 1)
      SELECT * FROM (
        SELECT 1 AS iter, l_sym, r_sym, l_sym || r_sym AS merged, pair_count FROM b1
        UNION ALL
        SELECT 2, l_sym, r_sym, l_sym || r_sym, pair_count FROM b2)
      ORDER BY iter""",

    // Re-learns the two merges (same CTEs as q100), then tokenizes every
    // document with them: wrap each word's symbols, apply merge 1 then
    // merge 2 as left-to-right replaces, count subword tokens.
    "q101_bpe_apply" -> """
      WITH words AS (
        SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
          SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
          FROM documents)
        WHERE len(w) > 0 GROUP BY w),
      r0 AS (SELECT regexp_replace(w, '(.)', '|\1|', 'g') AS rep, wc FROM words),
      t1 AS (SELECT string_split(trim(rep, '|'), '||') AS t, wc FROM r0),
      p1 AS (SELECT t[p] AS l_sym, t[p+1] AS r_sym, CAST(sum(wc) AS BIGINT) AS pair_count
             FROM (SELECT t, wc, unnest(generate_series(1, len(t) - 1)) AS p
                   FROM t1 WHERE len(t) >= 2)
             GROUP BY 1, 2),
      b1 AS (SELECT l_sym, r_sym FROM p1
             ORDER BY pair_count DESC, l_sym, r_sym LIMIT 1),
      r1 AS (SELECT replace(rep,
               '|' || (SELECT l_sym FROM b1) || '||' || (SELECT r_sym FROM b1) || '|',
               '|' || (SELECT l_sym FROM b1) || (SELECT r_sym FROM b1) || '|') AS rep, wc
             FROM r0),
      t2 AS (SELECT string_split(trim(rep, '|'), '||') AS t, wc FROM r1),
      p2 AS (SELECT t[p] AS l_sym, t[p+1] AS r_sym, CAST(sum(wc) AS BIGINT) AS pair_count
             FROM (SELECT t, wc, unnest(generate_series(1, len(t) - 1)) AS p
                   FROM t2 WHERE len(t) >= 2)
             GROUP BY 1, 2),
      b2 AS (SELECT l_sym, r_sym FROM p2
             ORDER BY pair_count DESC, l_sym, r_sym LIMIT 1),
      pats AS (SELECT
        '|' || b1.l_sym || '||' || b1.r_sym || '|' AS f1,
        '|' || b1.l_sym || b1.r_sym || '|' AS m1,
        '|' || b2.l_sym || '||' || b2.r_sym || '|' AS f2,
        '|' || b2.l_sym || b2.r_sym || '|' AS m2
        FROM b1, b2)
      SELECT d.doc_id,
             CAST(coalesce(list_sum(list_transform(
               [x for x in regexp_split_to_array(lower(d.text), '[^a-z0-9]+')
                  if len(x) > 0],
               w -> len(string_split(trim(
                 replace(replace(regexp_replace(w, '(.)', '|\1|', 'g'), f1, m1), f2, m2),
                 '|'), '||')))), 0) AS INTEGER) AS n_bpe_tokens
      FROM documents d CROSS JOIN pats ORDER BY d.doc_id""",

    // Mirrors gopherQualityFlags rule for rule; flags compare the RAW
    // metrics (identical double divisions of identical ints in both
    // engines), output ratios round to 4.
    "q102_gopher_rules" -> ("""
      WITH lined AS (
        SELECT doc_id,
          text || chr(10) ||
          CASE WHEN doc_id % 7 = 0 THEN """ +
      (1 to 20).map(i => s"'- bullet $i'").mkString(" || chr(10) || ") + """
               ELSE '- item' || chr(10) || '* item two' END || chr(10) ||
          CASE WHEN doc_id % 5 = 0
               THEN 'to be continued...' || chr(10) || 'more...' || chr(10) || 'yet more...'
               ELSE 'end.' END AS text
        FROM documents),
      m AS (
        SELECT doc_id, text,
          [x for x in regexp_split_to_array(text, '\s+') if len(x) > 0] AS ws,
          string_split(text, chr(10)) AS ls
        FROM lined),
      base AS (
        SELECT doc_id,
          CAST(len(ws) AS BIGINT) AS n_words,
          CAST(len(ls) AS BIGINT) AS n_lines,
          CAST(list_sum(list_transform(ws, w -> len(w))) AS DOUBLE) AS char_sum,
          CAST((len(text) - len(replace(text, '#', ''))) AS BIGINT)
            + CAST((len(text) - len(replace(text, '...', ''))) // 3 AS BIGINT)
            + CAST((len(text) - len(replace(text, '…', ''))) AS BIGINT) AS sym_cnt,
          CAST(len([l for l in ls if starts_with(l, '- ') OR starts_with(l, '* ')
                    OR starts_with(l, '•')]) AS DOUBLE) AS bullet_cnt,
          CAST(len([l for l in ls if ends_with(l, '...') OR ends_with(l, '…')]) AS DOUBLE)
            AS ell_cnt,
          CAST(len([w for w in ws if regexp_matches(w, '[A-Za-z]')]) AS DOUBLE) AS alpha_cnt,
          CAST(len([s for s in ['the','be','to','of','and','that','have','with']
                    if list_contains(list_transform(ws, w -> lower(w)), s)]) AS BIGINT)
            AS stop_hits
        FROM m),
      r AS (
        SELECT doc_id, n_words,
          CASE WHEN n_words > 0 THEN char_sum / n_words END AS mean_word_len,
          CASE WHEN n_words > 0 THEN CAST(sym_cnt AS DOUBLE) / n_words END AS symbol_ratio,
          bullet_cnt / n_lines AS bullet_frac,
          ell_cnt / n_lines AS ellipsis_frac,
          CASE WHEN n_words > 0 THEN alpha_cnt / n_words END AS alpha_frac,
          stop_hits
        FROM base)
      SELECT doc_id, n_words,
        round(mean_word_len, 4) AS mean_word_len,
        round(symbol_ratio, 4) AS symbol_ratio,
        round(bullet_frac, 4) AS bullet_frac,
        round(ellipsis_frac, 4) AS ellipsis_frac,
        round(alpha_frac, 4) AS alpha_frac,
        stop_hits,
        (n_words >= 50 AND n_words <= 100000) AS f_words,
        (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS f_mean_len,
        (symbol_ratio <= 0.1) AS f_symbols,
        (bullet_frac <= 0.9) AS f_bullets,
        (ellipsis_frac <= 0.3) AS f_ellipsis,
        (alpha_frac >= 0.8) AS f_alpha,
        (stop_hits >= 2) AS f_stops,
        coalesce((n_words >= 50 AND n_words <= 100000)
          AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
          AND (symbol_ratio <= 0.1) AND (bullet_frac <= 0.9)
          AND (ellipsis_frac <= 0.3) AND (alpha_frac >= 0.8)
          AND (stop_hits >= 2), false) AS keep
      FROM r ORDER BY doc_id"""),

    // Two unrolled PageRank iterations; the damping constants are written
    // as (1.0 - 0.85) to mirror the Spark-side lit(1.0 - damping)
    // arithmetic bit for bit.
    "q103_pagerank" -> """
      WITH e AS (
        SELECT source AS src,
               'site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS dst
        FROM documents WHERE doc_id % 11 <> 0
        UNION ALL
        SELECT source, 'blocked' || CAST(doc_id % 5 AS VARCHAR) || '.bad.net'
        FROM documents WHERE doc_id % 3 = 0),
      nodes AS (SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
      r0 AS (SELECT node, 1.0 / n.n AS rank FROM nodes CROSS JOIN n),
      c1 AS (SELECT e.dst, sum(r.rank / d.deg) AS contrib
             FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
      r1 AS (SELECT nodes.node, (1.0 - 0.85) / n.n + 0.85 * coalesce(c1.contrib, 0.0) AS rank
             FROM nodes LEFT JOIN c1 ON nodes.node = c1.dst CROSS JOIN n),
      c2 AS (SELECT e.dst, sum(r.rank / d.deg) AS contrib
             FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
      r2 AS (SELECT nodes.node, (1.0 - 0.85) / n.n + 0.85 * coalesce(c2.contrib, 0.0) AS rank
             FROM nodes LEFT JOIN c2 ON nodes.node = c2.dst CROSS JOIN n)
      SELECT node, round(rank, 6) AS rank FROM r2 ORDER BY node""",

    // q103's unrolled iterations with the teleport concentrated on the
    // two seeds: tele = 1/2 on src0/src1, 0 elsewhere; rank0 = tele.
    "q191_ppr" -> """
      WITH e AS (
        SELECT source AS src,
               'site' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS dst
        FROM documents WHERE doc_id % 11 <> 0
        UNION ALL
        SELECT source, 'blocked' || CAST(doc_id % 5 AS VARCHAR) || '.bad.net'
        FROM documents WHERE doc_id % 3 = 0),
      nodes AS (SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
      tl AS (SELECT node,
                    CASE WHEN node IN ('src0', 'src1') THEN 1.0 / 2 ELSE 0.0 END AS tele
             FROM nodes),
      deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
      r0 AS (SELECT node, tele AS rank FROM tl),
      c1 AS (SELECT e.dst, sum(r.rank / d.deg) AS contrib
             FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
      r1 AS (SELECT tl.node, (1.0 - 0.85) * tl.tele + 0.85 * coalesce(c1.contrib, 0.0) AS rank
             FROM tl LEFT JOIN c1 ON tl.node = c1.dst),
      c2 AS (SELECT e.dst, sum(r.rank / d.deg) AS contrib
             FROM e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.src
             GROUP BY e.dst),
      r2 AS (SELECT tl.node, (1.0 - 0.85) * tl.tele + 0.85 * coalesce(c2.contrib, 0.0) AS rank
             FROM tl LEFT JOIN c2 ON tl.node = c2.dst)
      SELECT node, round(rank, 6) AS rank FROM r2 ORDER BY node""",

    // Rebuilds the two hashed bag-of-words models (add-one smoothing, the
    // same 60-bit md5 bucket as q92) and the SEQUENTIAL token fold, so the
    // double sum is order-identical to Spark's aggregate() left fold.
    "q104_dsir_score" -> """
      WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
      bk AS (SELECT lang,
               CAST(CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) % 64 AS INTEGER) AS b
             FROM (SELECT lang, unnest(w) AS t FROM toks)),
      tc AS (SELECT b, count(*) AS c FROM bk WHERE lang = 'en' GROUP BY b),
      rc AS (SELECT b, count(*) AS c FROM bk GROUP BY b),
      tt AS (SELECT CAST(sum(c) AS DOUBLE) AS tot FROM tc),
      rt AS (SELECT CAST(sum(c) AS DOUBLE) AS tot FROM rc),
      ratio AS (
        SELECT i.b,
          ln((coalesce(tc.c, 0) + 1.0) / (tt.tot + 64)) -
          ln((coalesce(rc.c, 0) + 1.0) / (rt.tot + 64)) AS lr
        FROM (SELECT unnest(generate_series(0, 63)) AS b) i
        LEFT JOIN tc ON i.b = tc.b LEFT JOIN rc ON i.b = rc.b
        CROSS JOIN tt CROSS JOIN rt),
      rl AS (SELECT list(lr ORDER BY b) AS rl FROM ratio),
      scored AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(w, t -> rl[
              CAST(CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) % 64 AS INTEGER) + 1])),
            (acc, x) -> acc + x) AS z
        FROM toks CROSS JOIN rl)
      SELECT doc_id, n_tokens, round(z, 4) AS dsir_logratio,
             round(z, 4) > 0.0 AS keep
      FROM scored ORDER BY doc_id""",

    // Same trained model; the Gumbel key re-derives the salted 60-bit
    // content hash (q51's keyHash with salt 'dsir9') and selects on the
    // ROUNDED key exactly as the Spark side does.
    "q105_dsir_resample" -> """
      WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
      bk AS (SELECT lang,
               CAST(CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) % 64 AS INTEGER) AS b
             FROM (SELECT lang, unnest(w) AS t FROM toks)),
      tc AS (SELECT b, count(*) AS c FROM bk WHERE lang = 'en' GROUP BY b),
      rc AS (SELECT b, count(*) AS c FROM bk GROUP BY b),
      tt AS (SELECT CAST(sum(c) AS DOUBLE) AS tot FROM tc),
      rt AS (SELECT CAST(sum(c) AS DOUBLE) AS tot FROM rc),
      ratio AS (
        SELECT i.b,
          ln((coalesce(tc.c, 0) + 1.0) / (tt.tot + 64)) -
          ln((coalesce(rc.c, 0) + 1.0) / (rt.tot + 64)) AS lr
        FROM (SELECT unnest(generate_series(0, 63)) AS b) i
        LEFT JOIN tc ON i.b = tc.b LEFT JOIN rc ON i.b = rc.b
        CROSS JOIN tt CROSS JOIN rt),
      rl AS (SELECT list(lr ORDER BY b) AS rl FROM ratio),
      scored AS (
        SELECT doc_id,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(w, t -> rl[
              CAST(CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) % 64 AS INTEGER) + 1])),
            (acc, x) -> acc + x) AS z
        FROM toks CROSS JOIN rl),
      keyed AS (
        SELECT doc_id, z,
          round(z - ln(-ln(
            (CAST(CAST(concat('0x', substring(md5(concat('dsir9', CAST(doc_id AS VARCHAR))), 1, 15))
                  AS BIGINT) AS DOUBLE) + 0.5) / 1152921504606846976.0)), 4) AS gumbel_key
        FROM scored),
      sel AS (SELECT * FROM keyed ORDER BY gumbel_key DESC, doc_id LIMIT 100)
      SELECT doc_id, round(z, 4) AS dsir_logratio, gumbel_key
      FROM sel ORDER BY doc_id""",

    // KMV sketch rebuilt relationally: the k smallest DISTINCT salted md5
    // hashes per source ARE the sketch, so rn <= k + max(hv) reproduces
    // (size, h_k) exactly; the estimator literals multiply left-to-right
    // as the Spark side does (127.0 * 2^60 is float-exact — 7 significant
    // bits — so the one rounding step is the division in both engines).
    "q108_kmv_distinct" -> """
      WITH toks AS (SELECT source, string_split(text, ' ') AS w FROM documents),
      shl AS (
        SELECT source,
               unnest(CASE WHEN len(w) >= 3
                    THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
                    ELSE [array_to_string(w, ' ')] END) AS sh
        FROM toks),
      h AS (SELECT DISTINCT source,
              CAST(concat('0x', substring(md5('kmv9' || sh), 1, 15)) AS BIGINT) AS hv
            FROM shl),
      rk AS (SELECT source, hv, row_number() OVER (PARTITION BY source ORDER BY hv) AS rn FROM h),
      sk AS (SELECT source, count(*) AS sz, max(hv) AS hk FROM rk WHERE rn <= 128 GROUP BY source)
      SELECT source, CAST(sz AS INTEGER) AS sketch_size,
             round(CASE WHEN sz < 128 THEN CAST(sz AS DOUBLE)
                        ELSE 127.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE) END, 4) AS est_distinct
      FROM sk ORDER BY source""",

    // KMV overlap: the union sketch is the k smallest of the two per-side
    // sketches' union (recoverable from sketches alone — the property the
    // operator exploits); Jaccard = fraction of it present in both sides.
    "q109_kmv_overlap" -> """
      WITH toks AS (SELECT lang, string_split(text, ' ') AS w FROM documents WHERE lang IN ('en', 'de')),
      shl AS (
        SELECT lang,
               unnest(CASE WHEN len(w) >= 3
                    THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
                    ELSE [array_to_string(w, ' ')] END) AS sh
        FROM toks),
      h AS (SELECT DISTINCT lang,
              CAST(concat('0x', substring(md5('ov9' || sh), 1, 15)) AS BIGINT) AS hv
            FROM shl),
      sa AS (SELECT hv FROM h WHERE lang = 'en' ORDER BY hv LIMIT 128),
      sb AS (SELECT hv FROM h WHERE lang = 'de' ORDER BY hv LIMIT 128),
      mg AS (SELECT hv FROM (SELECT hv FROM sa UNION SELECT hv FROM sb) ORDER BY hv LIMIT 128),
      c AS (SELECT (SELECT count(*) FROM mg) AS msz,
                   (SELECT count(*) FROM mg m
                    WHERE m.hv IN (SELECT hv FROM sa) AND m.hv IN (SELECT hv FROM sb)) AS inboth,
                   (SELECT max(hv) FROM mg) AS hk)
      SELECT round(CAST(inboth AS DOUBLE) / CAST(msz AS DOUBLE), 6) AS jaccard_est,
             round(CASE WHEN msz < 128 THEN CAST(msz AS DOUBLE)
                        ELSE 127.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE) END, 4) AS union_est,
             round((CAST(inboth AS DOUBLE) / CAST(msz AS DOUBLE)) *
                   (CASE WHEN msz < 128 THEN CAST(msz AS DOUBLE)
                         ELSE 127.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE) END), 4) AS inter_est
      FROM c""",

    // HLL rebuilt register-for-register: bucket = top 6 hash bits, rank =
    // 55 - length(bin(w)) (floor(log2)+1 without floating log), registers
    // = per-bucket max, and the harmonic denominator sums as integers
    // scaled by 2^55 — the only double steps are the final multiply/divide
    // with the SAME Scala-printed constants the operator folds.
    "q110_hll_distinct" -> s"""
      WITH h AS (SELECT l_returnflag,
              CAST(concat('0x', substring(md5('hll9' || CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
            FROM lineitem),
      parts AS (SELECT l_returnflag, hv >> 54 AS bucket, hv & ${(1L << 54) - 1} AS w FROM h),
      ranks AS (SELECT l_returnflag, bucket,
              CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END AS rank FROM parts),
      regs AS (SELECT l_returnflag, bucket, max(rank) AS reg FROM ranks GROUP BY 1, 2),
      agg AS (SELECT l_returnflag, sum(1::BIGINT << (55 - reg)) AS z_occ, count(*) AS occ
              FROM regs GROUP BY 1),
      est AS (SELECT l_returnflag,
              CAST(z_occ + (64 - occ) * (1::BIGINT << 55) AS DOUBLE) AS z,
              64 - occ AS zeros FROM agg),
      raws AS (SELECT l_returnflag, ${Sketches.hllAlpha(64) * 64 * 64} * ${(1L << 55).toDouble} / z AS raw, zeros
               FROM est)
      SELECT l_returnflag,
             round(CASE WHEN raw <= 160.0 AND zeros > 0
                        THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE)) ELSE raw END, 4) AS hll_est,
             CAST(zeros AS INTEGER) AS zero_regs
      FROM raws ORDER BY l_returnflag""",

    // Count-Min rebuilt cell-for-cell: 4 salted bucket hashes per element,
    // counter = per-(row, bucket) count, probe estimate = min over the 4
    // cells (0 when untouched). Pure integers end to end.
    "q111_cms_freq" -> """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      shl AS (
        SELECT doc_id,
               unnest(CASE WHEN len(w) >= 3
                    THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
                    ELSE [array_to_string(w, ' ')] END) AS sh
        FROM toks),
      el AS (SELECT sh FROM shl),
      ex AS (SELECT sh, count(*) AS exact_cnt FROM el GROUP BY sh),
      probes AS (SELECT sh, exact_cnt FROM ex ORDER BY exact_cnt DESC, sh LIMIT 8),
      rs AS (SELECT unnest(range(4)) AS r),
      cells AS (SELECT r,
              CAST(concat('0x', substring(md5('cms9' || CAST(r AS VARCHAR) || sh), 1, 15)) AS BIGINT) % 512 AS b
            FROM el CROSS JOIN rs),
      sk AS (SELECT r, b, count(*) AS cnt FROM cells GROUP BY r, b),
      pq AS (SELECT p.sh, p.exact_cnt, r,
              CAST(concat('0x', substring(md5('cms9' || CAST(r AS VARCHAR) || p.sh), 1, 15)) AS BIGINT) % 512 AS b
             FROM probes p CROSS JOIN rs),
      est AS (SELECT sh, exact_cnt, min(coalesce(sk.cnt, 0)) AS cms_est
              FROM pq LEFT JOIN sk USING (r, b) GROUP BY sh, exact_cnt)
      SELECT sh, exact_cnt, cms_est FROM est ORDER BY sh""",

    // Bloom bitmap rebuilt word-for-word: 3 salted positions per history
    // text, word = pos DIV 32, bits = bit_or of (1 << pos % 32) — 32-bit
    // words so no shift touches the sign bit; a probe might_contain iff
    // all 3 of its positions' bits are set.
    "q112_bloom_history" -> """
      WITH rs AS (SELECT unnest(range(3)) AS r),
      hpos AS (SELECT CAST(concat('0x', substring(md5('bl9' || CAST(r AS VARCHAR) || text), 1, 15)) AS BIGINT) % 4096 AS pos
               FROM documents CROSS JOIN rs WHERE doc_id % 2 = 0),
      bloom AS (SELECT pos // 32 AS word, bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS bits
                FROM hpos GROUP BY 1),
      ppos AS (SELECT doc_id, CAST(concat('0x', substring(md5('bl9' || CAST(r AS VARCHAR) || text), 1, 15)) AS BIGINT) % 4096 AS pos
               FROM documents CROSS JOIN rs),
      hits AS (SELECT doc_id,
                 CASE WHEN (coalesce(b.bits, 0) & (1::BIGINT << CAST(p.pos % 32 AS INTEGER))) =
                           (1::BIGINT << CAST(p.pos % 32 AS INTEGER)) THEN 1 ELSE 0 END AS hit
               FROM ppos p LEFT JOIN bloom b ON p.pos // 32 = b.word)
      SELECT doc_id, min(hit) = 1 AS might_contain
      FROM hits GROUP BY doc_id ORDER BY doc_id""",

    "q91_temperature_mix" -> s"""
      WITH g AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY lang),
      t AS (SELECT sum(n) AS total, sum(pow(n, 0.5)) AS sa FROM g),
      r AS (SELECT lang, least(0.3 * t.total * pow(g.n, 0.5) / (t.sa * g.n), 1.0) AS rate
            FROM g CROSS JOIN t)
      SELECT d.doc_id, d.lang
      FROM documents d JOIN r USING (lang)
      WHERE ${duckKeyHash("d.doc_id", "temp-v1")} <
            CAST(floor(r.rate * 1152921504606846976.0) AS BIGINT)
      ORDER BY d.doc_id""",

    "q92_quality_score" -> s"""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      wv AS (SELECT [${qualityWeights.mkString(", ")}] AS wl)
      SELECT doc_id,
             round(1.0 / (1.0 + exp(-(
               list_reduce(
                 list_prepend(CAST(-0.5 AS DOUBLE),
                   list_transform(w, t -> wl[
                     CAST(CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT) % 64 AS INTEGER) + 1])),
                 (acc, x) -> acc + x)))), 4) AS quality_score
      FROM toks CROSS JOIN wv ORDER BY doc_id""",

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

    "q88_semdedup" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cents AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8),
      assign AS (
        SELECT vec_id, cid FROM (
          SELECT e.vec_id, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn
          FROM e CROSS JOIN cents c) WHERE rn = 1),
      dropped AS (
        SELECT DISTINCT b.vec_id
        FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
             JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
        WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= 0.3)
      SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster,
             (a.vec_id NOT IN (SELECT vec_id FROM dropped)) AS kept
      FROM assign a ORDER BY a.vec_id""",

    // Gaps-and-islands formulation of session_window semantics: a new
    // session starts only when the gap since the previous event STRICTLY
    // exceeds 3 h — Spark merges adjacent windows, so an event at exactly
    // last + gap still joins the session; session_end = last event + gap.
    "q42_sessionize" -> """
      WITH g AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 3 HOUR
                    THEN 1 ELSE 0 END AS new_s
        FROM events),
      i AS (
        SELECT user_id, ts, value,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM g)
      SELECT user_id,
             min(ts) AS session_start,
             max(ts) + INTERVAL 3 HOUR AS session_end,
             CAST(count(*) AS INTEGER) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
      FROM i GROUP BY user_id, sid ORDER BY user_id, session_start""",

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

    "q45_salted_join" -> """
      WITH dim(l_returnflag, flag_label) AS (
        VALUES ('A', 'returned'), ('N', 'normal'), ('R', 'refunded'))
      SELECT l.l_returnflag, d.flag_label, count(*) AS cnt,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_price
      FROM lineitem l JOIN dim d USING (l_returnflag)
      GROUP BY l.l_returnflag, d.flag_label
      ORDER BY l.l_returnflag""",

    // Round-trip identity: the wire id is deterministically 1 (first
    // registration in a fresh registry) and the magic byte must be present.
    "q46_confluent_roundtrip" -> """
      SELECT doc_id, text, CAST(1 AS INTEGER) AS schema_id, true AS magic_ok
      FROM documents ORDER BY doc_id""",

    // Round-trip identity; the json-path probe must recover the id from
    // the serialized bytes themselves.
    "q50_json_roundtrip" -> """
      SELECT doc_id, text, doc_id AS jpath_id
      FROM documents ORDER BY doc_id""",

    "q37_percentile" -> """
      SELECT l_returnflag,
             round(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 4) AS p50_qty,
             round(CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE), 4) AS p90_qty,
             round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 4) AS p50_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q38_weighted_mean" -> """
      SELECT l_returnflag,
             CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) /
             CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS wmean_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
