package graft.queries
import graft.Tables
import graft.operators.{AsofJoin, Chunking, Dedup, Multimodal, Profiler, RangeJoin, Rollup, Sampling, Similarity, Sketches, Skew, TextAnalysis, TimeSeries, Tokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import PackShared._

/** Similarity search & retrieval: brute/LSH/IVF/PQ/JL ANN, BM25, RRF, MMR/RBO/RM3 reranking, k-means, semdedup, embedding drift, TF-IDF cosine.
  *
  * Conventions: every computed column aliased identically on both
  * engines, deterministic ORDER BY, exact-decimal float sums — see
  * [[QueryPack]]. */
object RetrievalPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact ANN baseline: top-5 cosine neighbors of probes vec_id < 10.
    "q26_ann_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
        vectors = e, vectorId = "vec_id", vectorCol = "embedding",
        probes = e.filter(col("vec_id") < 10), probeId = "vec_id", probeCol = "embedding",
        k = 5)
        .orderBy(col("probe_id"), col("rnk"))
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
    // with no BroadcastNestedLoopJoin. r17: the query ships the AUTO
    // default — sizedBandBits resolves to the recall-1 width (3) at the
    // gate corpora and steps with the corpus past them, so the gated
    // entry point IS the deployment shape (SCALEPROBE_r16_sized's rule).
    "q48_cosine_pairs_lsh" -> ((s, d) => {
      Similarity.cosineNearDupPairsLsh(Tables.embeddings(s, d), "vec_id", "embedding",
        threshold = 0.3, dim = 64, bands = 32)
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

    // 1-BIT sign quantization (r15): the 32x-storage extreme of the
    // quantization ladder (int8 4x, PQ ~16x, sign 32x) — pack the sign
    // bit of every component into 32-bit words via the fused kernel.
    // The oracle re-derives every word as an integer sum of powers of
    // two — one drifted bit position, word boundary, or >= 0 sign rule
    // fails the hash. Pure per-row projection, zero shuffle.
    "q315_sign_quantize" -> ((s, d) => {
      Similarity.signQuantize(Tables.embeddings(s, d), "vec_id", "embedding")
        .select(col("vec_id"),
          element_at(col("code"), 1).as("w0"),
          element_at(col("code"), 2).as("w1"))
        .orderBy(col("vec_id"))
    }),

    // EXACT Hamming-radius search via multi-index hashing (Norouzi 2012):
    // 8 disjoint 8-bit bands over the 64-bit sign codes — pigeonhole
    // guarantees every pair within radius 7 agrees on some band, so the
    // band equi-join + exact verify has recall AND precision exactly 1
    // (unlike probabilistic LSH banding). The corpus plants a perturbed
    // twin per vec_id % 5 == 0 with a VARIED number of sign flips
    // (3..8 — the 8s fall outside the radius and must be excluded; the
    // background minimum is 15, measured). The oracle re-derives the
    // planted corpus, the packed codes, and ALL qualifying pairs by
    // brute force — set equality proves the pigeonhole path complete.
    "q316_hamming_pairs" -> ((s, d) => {
      val base = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      // `__orig` keeps the perturbation seed unambiguous (the q61 rule)
      val planted = base.filter(pmod(col("vec_id"), lit(5)) === 0)
        .select(col("vec_id").as("__orig"), col("embedding"))
        .select((col("__orig") + 100000000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(pmod((col("__orig") + i.cast("long"))
                * (col("__orig") + lit(2L) * i.cast("long") + 1L), lit(19)) === 0,
              -x).otherwise(x)).as("embedding"))
      val codes = Similarity.signQuantize(
        base.unionByName(planted), "vec_id", "embedding")
      Similarity.signHammingPairs(codes, "vec_id", "code",
          dim = 64, maxHamming = 7, bandBits = 8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Exact Hamming top-k over the packed codes — q26's 1-bit sibling
    // (broadcast probes, one corpus scan, per-probe rank). All-integer
    // distances with the (hamming, nbr_id) tie-break, so even the
    // RANKING is oracle-exact — no score quantization needed.
    "q317_hamming_topk" -> ((s, d) => {
      val codes = Similarity.signQuantize(Tables.embeddings(s, d), "vec_id", "embedding")
      Similarity.signHammingTopK(
          codes, "vec_id", "code",
          codes.filter(col("vec_id") < 10), "vec_id", "code", k = 5)
        .orderBy(col("probe_id"), col("rnk"))
    }),

    // BINARY semdedup end-to-end (r15): the 32x-memory dedup pipeline —
    // sign codes → exact MIH pairs at radius 7 → connected components →
    // cluster labels. q316's planted corpus (so clusters exist: each
    // orig+twin within radius forms one), q43's CC machinery. The
    // oracle replays pack + brute-force pairs + a recursive-CTE walk.
    "q322_binary_semdedup" -> ((s, d) => {
      val base = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val planted = base.filter(pmod(col("vec_id"), lit(5)) === 0)
        .select(col("vec_id").as("__orig"), col("embedding"))
        .select((col("__orig") + 100000000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(pmod((col("__orig") + i.cast("long"))
                * (col("__orig") + lit(2L) * i.cast("long") + 1L), lit(19)) === 0,
              -x).otherwise(x)).as("embedding"))
      val corpus = base.unionByName(planted)
      val codes = Similarity.signQuantize(corpus, "vec_id", "embedding")
      val pairs = Similarity.signHammingPairs(codes, "vec_id", "code",
        dim = 64, maxHamming = 7, bandBits = 8).select("id_a", "id_b")
      Dedup.connectedComponents(corpus.select(col("vec_id")), "vec_id",
          pairs, "id_a", "id_b")
        .orderBy(col("vec_id"))
    }),

    // SIGN-CODE FIDELITY card (r15): the production question behind the
    // 32x path — how well does the Hamming screen (radius 7) agree with
    // the true cosine gate (tau 0.8) on the planted-twin corpus? ONE
    // summary row: pair counts, the confusion overlap, and
    // recall/precision of the screen, every ratio one division of exact
    // counts (cosine thresholded on the q31/q61 round-6 grid). All-pairs
    // BY DESIGN — fidelity measurement is exhaustive at eval scale (the
    // q31 cartesian class); the production screen itself is q316's
    // banded join.
    "q327_sign_fidelity" -> ((s, d) => {
      val base = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val planted = base.filter(pmod(col("vec_id"), lit(5)) === 0)
        .select(col("vec_id").as("__orig"), col("embedding"))
        .select((col("__orig") + 100000000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(pmod((col("__orig") + i.cast("long"))
                * (col("__orig") + lit(2L) * i.cast("long") + 1L), lit(19)) === 0,
              -x).otherwise(x)).as("embedding"))
      val corpus = base.unionByName(planted)
      // sampleMod = 1 (full corpus) is the gate-scale diagnostics
      // setting; at deployment scale the card runs on the operator's
      // deterministic hash sample (sampleMod > 1) — see the scaladoc
      Similarity.signFidelityCard(corpus, "vec_id", "embedding",
        cosineThreshold = 0.8, maxHamming = 7, sampleMod = 1)
    }),

    // HARD-NEGATIVE mining (r15): top-5 cosine negatives per probe with
    // near-duplicates EXCLUDED before the rank — the contrastive-
    // training prep where a near-dup in the negative set poisons the
    // loss. Exclusions come from the 32x Hamming screen (q316's banded
    // pairs); probes 0 and 5 have planted twins at cosine ~0.9 that
    // must vanish from their top-5 (the gate's teeth). The oracle
    // replays pack, pairs, the NOT EXISTS exclusion, and the rank.
    "q330_hard_negatives" -> ((s, d) => {
      val base = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val planted = base.filter(pmod(col("vec_id"), lit(5)) === 0)
        .select(col("vec_id").as("__orig"), col("embedding"))
        .select((col("__orig") + 100000000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(pmod((col("__orig") + i.cast("long"))
                * (col("__orig") + lit(2L) * i.cast("long") + 1L), lit(19)) === 0,
              -x).otherwise(x)).as("embedding"))
      val corpus = base.unionByName(planted)
      val codes = Similarity.signQuantize(corpus, "vec_id", "embedding")
      val exclude = Similarity.signHammingPairs(codes, "vec_id", "code",
        dim = 64, maxHamming = 7, bandBits = 8).select("id_a", "id_b")
      Similarity.hardNegatives(
          corpus, "vec_id", "embedding",
          corpus.filter(col("vec_id") < 10), "vec_id", "embedding",
          exclude, k = 5)
        .orderBy(col("probe_id"), col("rnk"))
    }),

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

    // LSH sizing diagnostic: per-band bucket occupancy + predicted
    // candidate-pair volume at bandBits=4/bands=8 — the measurement the
    // documented bandBits sizing rule reads; oracle regenerates every
    // bucket from the published plane literals.
    "q166_lsh_occupancy" -> ((s, d) => {
      Similarity.lshOccupancyReport(Tables.embeddings(s, d), "vec_id", "embedding",
        dim = 64, bandBits = 4, bands = 8)
        .orderBy(col("band"))
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

    // Cross-CORPUS ANN pair mining: even vs odd embeddings through the
    // banded sign-LSH equi-join (never a cross join), exact verification;
    // q48's recall-1 band shape on this corpus, so the output equals the
    // exact cross-pair oracle. r17: ships the AUTO default — total rows
    // hashed (both corpora) resolve to the recall-1 width (3) at the gate
    // corpora and step with the corpus past them.
    "q155_cross_ann" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.crossCosinePairsLsh(
        e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
        threshold = 0.3, dim = 64, bands = 32)
        .orderBy(col("id_a"), col("id_b"))
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

    // Sparse TF-IDF cosine pairs: the lexical similarity join (shared
    // RARE terms weigh; maxDf caps the per-term quadratic BY CONTRACT).
    "q254_tfidf_cosine" -> ((s, d) => {
      TextAnalysis.tfidfCosinePairs(Tables.documents(s, d), "doc_id", "text",
        maxDf = 50, threshold = 0.3, topK = 50)
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
  )

  def oracles: Map[String, String] = Map(

    "q166_lsh_occupancy" -> lshOccupancyOracle,

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

    "q155_cross_ann" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
      FROM e a JOIN e b ON a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
      WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
      ORDER BY id_a, id_b""",

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
    "q33_ann_lsh" -> lshAnnOracle,
    "q61_cosine_lsh_prod" -> lshProdRecallOracle,
    "q205_rbo" -> rboOracle,
    "q206_mmr" -> mmrOracle,

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
    "q249_silhouette" -> silhouetteOracle,

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

    "q31_cosine_pairs" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
      ORDER BY id_a, id_b""",

    // q315: every packed word re-derived as an integer sum of powers of
    // two over the >= 0 sign tests.
    "q315_sign_quantize" -> """
      WITH bits AS (
        SELECT vec_id, k,
               CASE WHEN embedding[k + 1] >= 0 THEN 1::BIGINT << (k % 32) ELSE 0 END AS bv,
               k // 32 AS w
        FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS k))
      SELECT vec_id,
             CAST(sum(CASE WHEN w = 0 THEN bv ELSE 0 END) AS BIGINT) AS w0,
             CAST(sum(CASE WHEN w = 1 THEN bv ELSE 0 END) AS BIGINT) AS w1
      FROM bits GROUP BY vec_id ORDER BY vec_id""",

    // q316: the planted corpus re-derived (sign flips where
    // (v+k)(v+2k+1) % 19 = 0), packed, and ALL pairs within radius 7 by
    // brute force — set equality with the banded join proves MIH
    // complete (pigeonhole) and the verify precise.
    "q316_hamming_pairs" -> """
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000000,
               list_transform(generate_series(1, 64), j ->
                 CASE WHEN ((vec_id + (j - 1)) * (vec_id + 2 * (j - 1) + 1)) % 19 = 0
                      THEN -embedding[j] ELSE embedding[j] END)
        FROM embeddings WHERE vec_id % 5 = 0),
      bits AS (
        SELECT vec_id, k,
               CASE WHEN embedding[k + 1] >= 0 THEN 1::BIGINT << (k % 32) ELSE 0 END AS bv,
               k // 32 AS w
        FROM corpus CROSS JOIN (SELECT unnest(range(0, 64)) AS k)),
      codes AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN w = 0 THEN bv ELSE 0 END) AS BIGINT) AS w0,
               CAST(sum(CASE WHEN w = 1 THEN bv ELSE 0 END) AS BIGINT) AS w1
        FROM bits GROUP BY vec_id)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) AS BIGINT) AS hamming
      FROM codes a JOIN codes b ON a.vec_id < b.vec_id
      WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) <= 7
      ORDER BY id_a, id_b""",

    // q322: q316's pack + brute-force pairs, clustered by the q43
    // recursive-CTE min-label walk.
    "q322_binary_semdedup" -> """
      WITH RECURSIVE corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000000,
               list_transform(generate_series(1, 64), j ->
                 CASE WHEN ((vec_id + (j - 1)) * (vec_id + 2 * (j - 1) + 1)) % 19 = 0
                      THEN -embedding[j] ELSE embedding[j] END)
        FROM embeddings WHERE vec_id % 5 = 0),
      bits AS (
        SELECT vec_id, k,
               CASE WHEN embedding[k + 1] >= 0 THEN 1::BIGINT << (k % 32) ELSE 0 END AS bv,
               k // 32 AS w
        FROM corpus CROSS JOIN (SELECT unnest(range(0, 64)) AS k)),
      codes AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN w = 0 THEN bv ELSE 0 END) AS BIGINT) AS w0,
               CAST(sum(CASE WHEN w = 1 THEN bv ELSE 0 END) AS BIGINT) AS w1
        FROM bits GROUP BY vec_id),
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM codes a JOIN codes b ON a.vec_id < b.vec_id
        WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) <= 7),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs),
      walk(id, label) AS (
        SELECT vec_id, vec_id FROM corpus
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON w.id = e.src)
      SELECT id AS vec_id, min(label) AS cluster_id
      FROM walk GROUP BY id ORDER BY vec_id""",

    // q327: the same planted corpus, cosine on the q31 round-6 grid vs
    // the packed-code Hamming screen, one confusion-summary row.
    "q327_sign_fidelity" -> """
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000000,
               list_transform(generate_series(1, 64), j ->
                 CASE WHEN ((vec_id + (j - 1)) * (vec_id + 2 * (j - 1) + 1)) % 19 = 0
                      THEN -embedding[j] ELSE embedding[j] END)
        FROM embeddings WHERE vec_id % 5 = 0),
      bits AS (
        SELECT vec_id, k,
               CASE WHEN embedding[k + 1] >= 0 THEN 1::BIGINT << (k % 32) ELSE 0 END AS bv,
               k // 32 AS w
        FROM corpus CROSS JOIN (SELECT unnest(range(0, 64)) AS k)),
      codes AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN w = 0 THEN bv ELSE 0 END) AS BIGINT) AS w0,
               CAST(sum(CASE WHEN w = 1 THEN bv ELSE 0 END) AS BIGINT) AS w1
        FROM bits GROUP BY vec_id),
      e AS (SELECT c.vec_id, CAST(c.embedding AS DOUBLE[]) AS v, d.w0, d.w1
            FROM corpus c JOIN codes d USING (vec_id)),
      p AS (SELECT
              (round(list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.8) AS cp,
              (bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) <= 7) AS hp
            FROM e a JOIN e b ON a.vec_id < b.vec_id)
      SELECT CAST(count(*) AS BIGINT) AS pairs_total,
             CAST(count(*) FILTER (WHERE cp) AS BIGINT) AS cos_pairs,
             CAST(count(*) FILTER (WHERE hp) AS BIGINT) AS ham_pairs,
             CAST(count(*) FILTER (WHERE cp AND hp) AS BIGINT) AS both_pairs,
             round(CAST(count(*) FILTER (WHERE cp AND hp) AS DOUBLE)
                   / CAST(count(*) FILTER (WHERE cp) AS DOUBLE), 4) AS screen_recall,
             round(CAST(count(*) FILTER (WHERE cp AND hp) AS DOUBLE)
                   / CAST(count(*) FILTER (WHERE hp) AS DOUBLE), 4) AS screen_precision
      FROM p""",

    // q330: q316's pack + pairs as the exclusion set, q26's cosine rank
    // with the NOT EXISTS anti-join applied before row_number.
    "q330_hard_negatives" -> """
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000000,
               list_transform(generate_series(1, 64), j ->
                 CASE WHEN ((vec_id + (j - 1)) * (vec_id + 2 * (j - 1) + 1)) % 19 = 0
                      THEN -embedding[j] ELSE embedding[j] END)
        FROM embeddings WHERE vec_id % 5 = 0),
      bits AS (
        SELECT vec_id, k,
               CASE WHEN embedding[k + 1] >= 0 THEN 1::BIGINT << (k % 32) ELSE 0 END AS bv,
               k // 32 AS w
        FROM corpus CROSS JOIN (SELECT unnest(range(0, 64)) AS k)),
      codes AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN w = 0 THEN bv ELSE 0 END) AS BIGINT) AS w0,
               CAST(sum(CASE WHEN w = 1 THEN bv ELSE 0 END) AS BIGINT) AS w1
        FROM bits GROUP BY vec_id),
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM codes a JOIN codes b ON a.vec_id < b.vec_id
        WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1)) <= 7),
      ex AS (SELECT id_a AS pid, id_b AS nid FROM pairs
             UNION SELECT id_b, id_a FROM pairs),
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM corpus),
      p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 10),
      s AS (SELECT probe_id, e.vec_id AS nbr_id,
                   list_dot_product(pv, e.v)
                     / (sqrt(list_dot_product(pv, pv))
                        * sqrt(list_dot_product(e.v, e.v))) AS sim
            FROM p CROSS JOIN e
            WHERE e.vec_id != probe_id
              AND NOT EXISTS (SELECT 1 FROM ex
                              WHERE ex.pid = probe_id AND ex.nid = e.vec_id)),
      r AS (SELECT probe_id, nbr_id, sim,
                   row_number() OVER (PARTITION BY probe_id
                                      ORDER BY sim DESC, nbr_id) AS rnk
            FROM s)
      SELECT probe_id, CAST(rnk AS INTEGER) AS rnk, nbr_id,
             round(sim, 4) + 0.0 AS cos_sim
      FROM r WHERE rnk <= 5 ORDER BY probe_id, rnk""",

    // q317: brute-force Hamming top-5 with the all-integer
    // (hamming, nbr_id) rank — even the ranking is engine-exact.
    "q317_hamming_topk" -> """
      WITH bits AS (
        SELECT vec_id, k,
               CASE WHEN embedding[k + 1] >= 0 THEN 1::BIGINT << (k % 32) ELSE 0 END AS bv,
               k // 32 AS w
        FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS k)),
      codes AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN w = 0 THEN bv ELSE 0 END) AS BIGINT) AS w0,
               CAST(sum(CASE WHEN w = 1 THEN bv ELSE 0 END) AS BIGINT) AS w1
        FROM bits GROUP BY vec_id),
      s AS (SELECT p.vec_id AS probe_id, e.vec_id AS nbr_id,
                   CAST(bit_count(xor(p.w0, e.w0)) + bit_count(xor(p.w1, e.w1)) AS BIGINT) AS hamming
            FROM codes p CROSS JOIN codes e
            WHERE p.vec_id < 10 AND e.vec_id != p.vec_id),
      r AS (SELECT probe_id, nbr_id, hamming,
                   row_number() OVER (PARTITION BY probe_id ORDER BY hamming, nbr_id) AS rnk
            FROM s)
      SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, nbr_id, hamming
      FROM r WHERE rnk <= 5 ORDER BY probe_id, rnk""",

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
  )
}
