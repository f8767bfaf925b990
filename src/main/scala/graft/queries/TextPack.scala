package graft.queries
import graft.Tables
import graft.operators.{AsofJoin, Chunking, Dedup, Multimodal, Profiler, RangeJoin, Rollup, Sampling, Similarity, Sketches, Skew, TextAnalysis, TimeSeries, Tokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import PackShared._

/** Text analysis: quality scoring, language ID, tokenization/BPE, n-gram stats, perplexity, readability, PII, Gopher/C4 rules, collocations, keyword tests.
  *
  * Conventions: every computed column aliased identically on both
  * engines, deterministic ORDER BY, exact-decimal float sums — see
  * [[QueryPack]]. */
object TextPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // Heavy-hitter 3-grams (boilerplate mining): exact counts, top 50,
    // gram tiebreak — one map-side-combined count shuffle + TakeOrdered
    // (never a global sort).
    "q65_top_ngrams" -> ((s, d) =>
      TextAnalysis.topNgrams(Tables.documents(s, d), "text", n = 3, k = 50)),

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

    // T5/BART-style span corruption: deterministic hash-seeded span masks,
    // whole runs collapsed to one <MASK> in the input, masked spans joined
    // <SEP>-delimited into the target. Pure per-row projection; the oracle
    // replays the same hash/window/rebuild arithmetic.
    "q121_span_corruption" -> ((s, d) => {
      Chunking.spanCorruption(Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", startRate = 0.08, spanTokens = 3, salt = "sc1")
        .orderBy(col("doc_id"))
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

    // Bigram LM self-perplexity (the CCNet statistical quality signal):
    // add-1-smoothed bigram model trained on the corpus scoring the corpus.
    "q95_bigram_ppl" -> ((s, d) => {
      TextAnalysis.bigramPerplexity(Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text")
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

    // Lexical-diversity card per language: TTR, hapax fraction, Simpson
    // repeat-probability — integer counts to the last ratio.
    "q181_lexical_diversity" -> ((s, d) => {
      TextAnalysis.lexicalDiversity(Tables.documents(s, d), "lang", "text")
        .orderBy(col("grp"))
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

    // Heaps'-law vocabulary-growth fit over id-range checkpoints.
    "q247_heaps_law" -> ((s, d) =>
      TextAnalysis.heapsLaw(Tables.documents(s, d), "doc_id", "text", buckets = 10)),

    // Good-Turing coverage card: exact token/vocab/hapax counts and the
    // n1/N unseen-mass estimate — how much of the long tail this corpus
    // has actually captured.
    "q271_coverage_card" -> ((s, d) =>
      TextAnalysis.coverageCard(Tables.documents(s, d), "text")),

    // Zipf fit of the token distribution over the top-1000 ranks — the
    // vocabulary-anomaly card statistic (natural text ~ slope -1).
    "q149_zipf" -> ((s, d) => {
      TextAnalysis.zipfFit(Tables.documents(s, d), "text", topRanks = 1000)
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

    // Unigram-LM tokenization on REAL text under a fixed vocabulary whose
    // optimum has a closed form: the pieces th/er/on are built from six
    // DISTINCT letters, so no two piece occurrences can ever overlap and
    // the Viterbi optimum provably takes every occurrence (each replaces
    // two -3.0 chars with one -5.5 piece: +0.5 per occurrence). The
    // oracle counts occurrences per original word with replace() — any
    // DP drift (wrong transition, wrong tie-break, missed occurrence)
    // changes score or token count and fails the hash. Pure per-row
    // fused-kernel projection: zero shuffle at any scale.
    "q294_unigram_tokens" -> ((s, d) => {
      val chars = (('a' to 'z') ++ ('0' to '9')).map(c => c.toString -> -3000000L)
      val v = graft.operators.UnigramLm.fixedVocab(
        chars ++ Seq("th" -> -5500000L, "er" -> -5500000L, "on" -> -5500000L),
        maxPieceLen = 2)
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.operators.UnigramLm.docStats(coalesce(col("text"), lit("")), v).as("__s"))
        .select(col("doc_id"),
          element_at(col("__s"), 1).as("score_micro"),
          element_at(col("__s"), 2).as("n_tokens"),
          element_at(col("__s"), 3).as("n_words"))
        .orderBy(col("doc_id"))
    }),

    // Unigram-LM Viterbi on PLANTED bounded words (length 4..8 over
    // {a,b}, characters = the binary expansion of doc_id) under a vocab
    // with genuinely OVERLAPPING pieces (ab/ba/aa/bab/aab) — the DP-hard
    // case q294's closed form can't reach. The oracle unrolls the exact
    // DP positionally in SQL: per position, the three candidate
    // transitions, max score then min tokens — the engine's tie-break
    // rule replayed literally.
    "q295_unigram_viterbi" -> ((s, d) => {
      val v = graft.operators.UnigramLm.fixedVocab(
        Seq("a" -> -3000000L, "b" -> -3100000L,
          "ab" -> -5500000L, "ba" -> -5400000L, "aa" -> -5900000L,
          "bab" -> -8000000L, "aab" -> -8100000L),
        maxPieceLen = 3)
      val w8 = concat((0 to 7).map(k =>
        expr(s"CASE WHEN (doc_id div ${1 << k}) % 2 = 0 THEN 'a' ELSE 'b' END")): _*)
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("4 + CAST(doc_id % 5 AS INT)").as("__n"), w8.as("__w8"))
        .select(col("doc_id"), expr("substring(__w8, 1, __n)").as("__w"))
        .select(col("doc_id"),
          graft.operators.UnigramLm.docStats(col("__w"), v).as("__s"))
        .select(col("doc_id"),
          element_at(col("__s"), 1).as("score_micro"),
          element_at(col("__s"), 2).as("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Vocabulary-transfer card: q294's fixed vocabulary applied per
    // language group — doc/word/token/score totals (exact long sums off
    // the fused kernel) and the tokens-per-word fragmentation ratio (one
    // division of two exact sums). The oracle re-derives every total
    // from the q294 closed form grouped by lang.
    "q301_unigram_transfer_card" -> ((s, d) => {
      val chars = (('a' to 'z') ++ ('0' to '9')).map(c => c.toString -> -3000000L)
      val v = graft.operators.UnigramLm.fixedVocab(
        chars ++ Seq("th" -> -5500000L, "er" -> -5500000L, "on" -> -5500000L),
        maxPieceLen = 2)
      graft.operators.UnigramLm.transferCard(
          Tables.documents(s, d).select(col("lang"), col("text")), "text", "lang", v)
        .orderBy(col("lang"))
    }),

    // q301's card driven CONTINUOUSLY: documents drained through the
    // per-shard O(1) moment fold (same fused docStats kernel row for
    // row), max-epoch snapshots long-summed and finished with the batch
    // card's one-division ratio — the readout must be bit-identical to
    // the q294 closed form's global totals.
    "q302_streaming_unigram" -> ((s, d) => {
      import s.implicits._
      val chars = (('a' to 'z') ++ ('0' to '9')).map(c => c.toString -> -3000000L)
      val v = graft.operators.UnigramLm.fixedVocab(
        chars ++ Seq("th" -> -5500000L, "er" -> -5500000L, "on" -> -5500000L),
        maxPieceLen = 2)
      val staged = Tables.documents(s, d).select(
        pmod(col("doc_id"), lit(4)).cast("int").as("_1"),
        col("doc_id").cast("long").as("_2"),
        col("text").cast("string").as("_3"))
      val snaps = PackShared.drainStaged(s, staged, "q302_sink", "q302-docs")(
        in => graft.streaming.StreamingUnigramMonitor
          .stats(in.as[(Int, Long, String)], v)
          .toDF("shard", "epoch", "n_docs", "n_words", "n_tokens", "score_micro"))
      graft.streaming.StreamingUnigramMonitor.readout(snaps)
    }),

    // BPE-DROPOUT (Provilkov 2020) — the BPE sibling of q304's
    // deterministic subword regularization: the two q101 merges, each
    // SKIPPED per (word, merge) on the shared md5 keyHash grid at
    // p=0.5, salt 'ep1'. Emitted next to the undropped count (dropout
    // can only split finer: n_dropout_tokens >= n_bpe_tokens). The
    // oracle inlines the same drop predicate into q101's CTE chain.
    "q305_bpe_dropout" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val merges = Tokenizer.mergesOf(
        Tokenizer.trainBpe(docs.select(col("text")), "text", merges = 2))
      docs.select(col("doc_id"),
          Tokenizer.bpeTokenCount(col("text"), merges).as("n_bpe_tokens"),
          Tokenizer.bpeDropoutTokenCount(col("text"), merges,
            dropMicro = 500000, salt = "ep1").as("n_dropout_tokens"))
        .orderBy(col("doc_id"))
    }),

    // PACKING under SAMPLED token counts — the epoch-varying composition
    // (q304's deterministic augmentation feeding q60's distributed
    // prefix-sum packer): per planted word the hash-chosen 3-best rank's
    // token count, binned into 16-token packs across 8 order-aligned
    // buckets; the oracle re-derives the counts from the enumeration and
    // packs with a single global cumsum — bucketing moves work, never
    // results.
    "q306_sampled_packing" -> ((s, d) => {
      val v = graft.operators.UnigramLm.fixedVocab(
        Seq("a" -> -3000000L, "b" -> -3100000L,
          "ab" -> -5500000L, "ba" -> -5400000L, "aa" -> -5900000L,
          "bab" -> -8000000L, "aab" -> -8100000L),
        maxPieceLen = 3)
      val w8 = concat((0 to 7).map(k =>
        expr(s"CASE WHEN (doc_id div ${1 << k}) % 2 = 0 THEN 'a' ELSE 'b' END")): _*)
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          expr("4 + CAST(doc_id % 5 AS INT)").as("__n"), w8.as("__w8"))
        .select(col("doc_id"), lit(0).as("chunk_idx"),
          graft.operators.UnigramLm.sampledTokenCount(
            expr("substring(__w8, 1, __n)"), v, n = 3, salt = "aug1").as("n_tokens"))
      Chunking.packSequences(toks, "doc_id", "chunk_idx", "n_tokens",
          capacity = 16, buckets = 8)
        .select(col("doc_id"), col("n_tokens"), col("pack_id"))
        .orderBy(col("doc_id"))
    }),

    // Likelihood-loss PRUNING (SentencePiece's real criterion): the
    // planted corpus is Viterbi-decoded (distributed E-step: explode the
    // fused tokens, one counting aggregation), and each piece's loss =
    // count x (lp - best-alternative-score of its own string) decides
    // survival at vocabSize=4. On this corpus the loss rule keeps
    // {ab, ba} where the count rule would keep {aab, ba} -- the gate
    // distinguishes the criteria. The oracle re-derives the decode, the
    // counts, the alternatives (a second recursive enumeration, tk >= 2
    // = the piece itself masked), and the keep ranking.
    "q307_unigram_prune_loss" -> ((s, d) => {
      import s.implicits._
      val lps = Seq("a" -> -3000000L, "b" -> -3100000L,
        "ab" -> -5500000L, "ba" -> -5400000L, "aa" -> -5900000L,
        "bab" -> -8000000L, "aab" -> -8100000L)
      val v = graft.operators.UnigramLm.fixedVocab(lps, maxPieceLen = 3)
      val w8 = concat((0 to 7).map(k =>
        expr(s"CASE WHEN (doc_id div ${1 << k}) % 2 = 0 THEN 'a' ELSE 'b' END")): _*)
      val counted = Tables.documents(s, d)
        .select(col("doc_id"),
          expr("4 + CAST(doc_id % 5 AS INT)").as("__n"), w8.as("__w8"))
        .select(explode(graft.operators.UnigramLm.tokens(
          expr("substring(__w8, 1, __n)"), v)).as("piece"))
        .groupBy(col("piece")).agg(count(lit(1)).as("cnt"))
        .collect() // pieces-bounded: <= |vocab| rows
      val lpMap = lps.toMap
      val pieces = counted.map(r => graft.operators.UnigramLm.UnigramPiece(
        r.getString(0), r.getLong(1), lpMap(r.getString(0)))).toSeq
      graft.operators.UnigramLm.pieceLosses(pieces, vocabSize = 4, maxPieceLen = 3)
        .toDF().orderBy(col("piece"))
    }),

    // N-BEST unigram segmentations (the machinery behind subword
    // regularization and n-best E-steps) on the q295 planted words under
    // the overlapping-piece vocab: top-3 (score, tokens) per word in the
    // engine's total order (score desc, tokens asc, longest-final-piece).
    // The oracle enumerates EVERY segmentation with a recursive CTE and
    // ranks by the same order — a drifted candidate, cap, or tie-break
    // anywhere in the n-best DP fails the hash.
    "q303_unigram_nbest" -> ((s, d) => {
      val v = graft.operators.UnigramLm.fixedVocab(
        Seq("a" -> -3000000L, "b" -> -3100000L,
          "ab" -> -5500000L, "ba" -> -5400000L, "aa" -> -5900000L,
          "bab" -> -8000000L, "aab" -> -8100000L),
        maxPieceLen = 3)
      val w8 = concat((0 to 7).map(k =>
        expr(s"CASE WHEN (doc_id div ${1 << k}) % 2 = 0 THEN 'a' ELSE 'b' END")): _*)
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("4 + CAST(doc_id % 5 AS INT)").as("__n"), w8.as("__w8"))
        .select(col("doc_id"),
          graft.operators.UnigramLm.nBest(expr("substring(__w8, 1, __n)"), v, 3).as("__nb"))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, size(__nb) div 2 - 1),
            |  i -> struct(CAST(i + 1 AS BIGINT) AS rank,
            |              __nb[CAST(2 * i AS INT)] AS score_micro,
            |              __nb[CAST(2 * i + 1 AS INT)] AS n_tokens))""".stripMargin)).as("__r"))
        .select(col("doc_id"), col("__r.rank").as("rank"),
          col("__r.score_micro").as("score_micro"), col("__r.n_tokens").as("n_tokens"))
        .orderBy(col("doc_id"), col("rank"))
    }),

    // SAMPLED segmentation (deterministic subword regularization): per
    // planted word, the hash-chosen rank of its 3-best replaces rank 1 —
    // the replayable augmentation epoch. The oracle enumerates, ranks,
    // and picks the SAME rank via the shared md5 60-bit keyHash grid.
    "q304_unigram_sampled" -> ((s, d) => {
      val v = graft.operators.UnigramLm.fixedVocab(
        Seq("a" -> -3000000L, "b" -> -3100000L,
          "ab" -> -5500000L, "ba" -> -5400000L, "aa" -> -5900000L,
          "bab" -> -8000000L, "aab" -> -8100000L),
        maxPieceLen = 3)
      val w8 = concat((0 to 7).map(k =>
        expr(s"CASE WHEN (doc_id div ${1 << k}) % 2 = 0 THEN 'a' ELSE 'b' END")): _*)
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("4 + CAST(doc_id % 5 AS INT)").as("__n"), w8.as("__w8"))
        .select(col("doc_id"),
          graft.operators.UnigramLm.sampledStats(
            expr("substring(__w8, 1, __n)"), v, n = 3, salt = "aug1").as("__s"))
        .select(col("doc_id"),
          element_at(col("__s"), 1).as("score_micro"),
          element_at(col("__s"), 2).as("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // WordPiece (BERT-family) greedy tokenization on REAL text — the
    // q294 closed-form trick carries over: with char-disjoint pieces
    // th/er/on (in BOTH the initial and ## continuation sets) no piece
    // occurrence can be preempted by another (second chars h/r/n are
    // disjoint from first chars t/e/o), so greedy longest-match takes
    // exactly every occurrence and n_tokens = len − Σocc. Full char
    // coverage → zero UNKs on [a-z0-9] words. Pure per-row fused-kernel
    // projection — zero shuffle at any scale.
    "q312_wordpiece_tokens" -> ((s, d) => {
      val chars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
      val v = graft.operators.WordPiece.fixedVocab(
        initial = chars ++ Seq("th", "er", "on"),
        continuation = chars ++ Seq("th", "er", "on"), maxPieceLen = 2)
      // Planted mega-word (120 chars of fully-covered pieces): WITHOUT
      // HF's max_input_chars_per_word=100 cutoff it would tokenize to 60
      // 'th' pieces; WITH it the whole word is one [UNK] — so the
      // cross-engine gate exercises the cutoff, not just the formula.
      val planted = s.range(1).select(lit(1000001L).as("doc_id"),
        concat(lit("the "), lit("th" * 60), lit(" on")).as("text"))
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .unionByName(planted)
        .select(col("doc_id"),
          graft.operators.WordPiece.docStats(coalesce(col("text"), lit("")), v).as("__s"))
        .select(col("doc_id"),
          element_at(col("__s"), 1).as("n_tokens"),
          element_at(col("__s"), 2).as("n_unk_words"),
          element_at(col("__s"), 3).as("n_words"))
        .orderBy(col("doc_id"))
    }),

    // WordPiece greedy on PLANTED bounded words (q295's binary-expansion
    // construction) under a vocab with position-dependent sets and a
    // coverage GAP (no lone '##a'): greedy must pick 'bab'/'aa'/'ab' at
    // word start, 2-char continuations before '##b', and degrade the
    // WHOLE word to [UNK] on a trailing lone 'a' (126 of 500 ids at
    // sf0.01; token counts spread 1..5). The oracle unrolls the greedy
    // consumption positionally as an 8-stage machine — pre-verified
    // against an independent reference over all 500 ids.
    "q313_wordpiece_greedy" -> ((s, d) => {
      val v = graft.operators.WordPiece.fixedVocab(
        initial = Seq("a", "b", "aa", "ab", "bab"),
        continuation = Seq("b", "ab", "ba", "bb", "aa"), maxPieceLen = 3)
      val w8 = concat((0 to 7).map(k =>
        expr(s"CASE WHEN (doc_id div ${1 << k}) % 2 = 0 THEN 'a' ELSE 'b' END")): _*)
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("4 + CAST(doc_id % 5 AS INT)").as("__n"), w8.as("__w8"))
        .select(col("doc_id"),
          graft.operators.WordPiece.docStats(expr("substring(__w8, 1, __n)"), v).as("__s"))
        .select(col("doc_id"),
          element_at(col("__s"), 1).as("n_tokens"),
          (element_at(col("__s"), 2) === 1L).as("is_unk"))
        .orderBy(col("doc_id"))
    }),

    // WordPiece vocabulary-COVERAGE card (r15): the q312 vocabulary with
    // the alphabet GAPPED (no q/x/z in either set), so a word is UNK iff
    // it contains one of those letters — a closed form the oracle
    // replays with one regex per word — and covered words keep the
    // occurrence-count token formula. Per-lang exact totals + the UNK
    // rate as one division of two exact sums. One scan + one
    // |groups|-row aggregation.
    "q319_wordpiece_card" -> ((s, d) => {
      val chars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
        .filterNot(Set("q", "x", "z"))
      val v = graft.operators.WordPiece.fixedVocab(
        initial = chars ++ Seq("th", "er", "on"),
        continuation = chars ++ Seq("th", "er", "on"), maxPieceLen = 2)
      // q312's planted mega-word (no q/x/z, so only the LENGTH cutoff can
      // UNK it) — the per-lang card must count it as 1 UNK word / 1 token.
      val planted = s.range(1).select(lit("en").as("lang"),
        concat(lit("the "), lit("th" * 60), lit(" on")).as("text"))
      graft.operators.WordPiece.coverageCard(
          Tables.documents(s, d).select(col("lang"), col("text"))
            .unionByName(planted), "text", "lang", v)
        .orderBy(col("lang"))
    }),

    // q319's card driven CONTINUOUSLY (the q302 pattern): documents
    // drained through the per-shard O(1) coverage fold (same fused
    // greedy kernel row for row), max-epoch snapshots long-summed and
    // finished with the batch card's one-division UNK rate — the
    // readout must be bit-identical to q319's closed form globally.
    "q320_streaming_wordpiece" -> ((s, d) => {
      import s.implicits._
      val chars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
        .filterNot(Set("q", "x", "z"))
      val v = graft.operators.WordPiece.fixedVocab(
        initial = chars ++ Seq("th", "er", "on"),
        continuation = chars ++ Seq("th", "er", "on"), maxPieceLen = 2)
      // q312's planted mega-word flows through the same per-shard fold —
      // the drained readout must count it under the length cutoff too
      val staged = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .unionByName(s.range(1).select(lit(1000001L).as("doc_id"),
          concat(lit("the "), lit("th" * 60), lit(" on")).as("text")))
        .select(
          pmod(col("doc_id"), lit(4)).cast("int").as("_1"),
          col("doc_id").cast("long").as("_2"),
          col("text").cast("string").as("_3"))
      val snaps = PackShared.drainStaged(s, staged, "q320_sink", "q320-docs")(
        in => graft.streaming.StreamingWordPieceMonitor
          .stats(in.as[(Int, Long, String)], v)
          .toDF("shard", "epoch", "n_docs", "n_words", "n_tokens", "n_unk_words"))
      graft.streaming.StreamingWordPieceMonitor.readout(snaps)
    }),

    // Distributed WordPiece training (the BERT-family criterion): 2
    // merges over the ##-marked word-frequency table, each merge chosen
    // by the QUANTIZED likelihood ratio ⌊pair·10¹²/(l_count·r_count)⌋ —
    // exact integer division (DECIMAL(38,0) div here, HUGEINT // in the
    // oracle), ties (score desc, l, r). The oracle unrolls both
    // iterations with the same pair/symbol recounts — a drifted count,
    // rounding, or tie-break anywhere fails the hash.
    "q314_wordpiece_train" -> ((s, d) => {
      graft.operators.WordPiece.trainWordPiece(
          Tables.documents(s, d).select(col("text")), "text", merges = 2)
        .orderBy(col("iter"))
    }),

    // Interpolated KNESER-NEY bigram perplexity (r15, forward-list #2
    // shipped early): absolute discount 0.75 (exactly 3/4) + the
    // CONTINUATION-probability backoff — the classic smoothing the
    // interpolated-unigram form (q162) approximates. Train on even
    // docs, score odd; the oracle replays the discounted formula, the
    // continuation counts, and the add-k OOV guard expression for
    // expression (the q162 ln/exp discipline, round 4).
    "q331_kneser_ney_ppl" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.bigramPerplexityKneserNey(
          docs.filter(col("doc_id") % 2 === 1).select(col("doc_id"), col("text")),
          "doc_id", "text",
          trainOn = Some(docs.filter(col("doc_id") % 2 === 0)))
        .orderBy(col("doc_id"))
    }),

    // TRIGRAM Kneser-Ney (r15): the order-3 form — discounted trigram
    // mass backing off into a CONTINUATION-count bigram level, then the
    // add-k continuation unigram. Nine exact count tables, one fixed
    // float expression replayed literally by the oracle. Train even,
    // score odd (the q162/q331 construction).
    "q332_kn_trigram_ppl" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.trigramPerplexityKneserNey(
          docs.filter(col("doc_id") % 2 === 1).select(col("doc_id"), col("text")),
          "doc_id", "text",
          trainOn = Some(docs.filter(col("doc_id") % 2 === 0)))
        .orderBy(col("doc_id"))
    }),

    // Unigram-LM SEED vocabulary (training stage 1) on real text: every
    // substring of length <= 3 of every corpus word, weighted by word
    // count; top-40 by (count desc, piece asc) with single characters
    // forced in. Exact integer counts, total-order tie-break — the
    // oracle re-derives the table with its own substring explode.
    "q296_unigram_seed" -> ((s, d) => {
      graft.operators.UnigramLm.seedVocab(
          Tables.documents(s, d).select(col("text")), "text",
          maxPieceLen = 3, seedSize = 40)
        .orderBy(col("piece"))
    }),
  )

  /** One stage of the q313 greedy machine: consume the longest matching
    * piece at `pos` (1-based), or latch `unk` — pre-verified against an
    * independent reference greedy over all 500 ids. */
  private def wpGreedyStage(k: Int): String =
    s"""s$k AS (SELECT *, CASE WHEN unk OR pos > wlen THEN 0
       |     WHEN pos = 1 THEN (CASE WHEN substr(w, 1, 3) = 'bab' THEN 3
       |                             WHEN substr(w, 1, 2) IN ('aa','ab') THEN 2
       |                             ELSE 1 END)
       |     ELSE (CASE WHEN substr(w, pos, 2) IN ('ab','ba','bb','aa') THEN 2
       |                WHEN substr(w, pos, 1) = 'b' THEN 1 ELSE -1 END) END AS st
       |   FROM g${k - 1}),
       |g$k AS (SELECT doc_id, w, wlen,
       |     CASE WHEN st > 0 THEN pos + st ELSE pos END AS pos,
       |     CASE WHEN st > 0 THEN toks + 1 ELSE toks END AS toks,
       |     (unk OR st = -1) AS unk FROM s$k)""".stripMargin

  /** One unrolled WordPiece training iteration (the q100 CTE shape plus
    * symbol counts and the HUGEINT quantized-ratio argmax). */
  private def wpTrainIter(i: Int): String = {
    val prev = s"r${i - 1}"
    s"""t$i AS (SELECT string_split(trim(rep, '|'), '||') AS t, wc FROM $prev),
       |p$i AS (SELECT t[p] AS l_sym, t[p+1] AS r_sym, CAST(sum(wc) AS BIGINT) AS pair_count
       |       FROM (SELECT t, wc, unnest(generate_series(1, len(t) - 1)) AS p
       |             FROM t$i WHERE len(t) >= 2)
       |       GROUP BY 1, 2),
       |y$i AS (SELECT sym, CAST(sum(wc) AS BIGINT) AS sym_count
       |       FROM (SELECT unnest(t) AS sym, wc FROM t$i) GROUP BY sym),
       |b$i AS (SELECT l_sym, r_sym, pair_count,
       |              sl.sym_count AS l_count, sr.sym_count AS r_count,
       |              CAST((CAST(pair_count AS HUGEINT) * 1000000000000)
       |                // (CAST(sl.sym_count AS HUGEINT) * sr.sym_count) AS BIGINT) AS score_e12,
       |              l_sym || (CASE WHEN starts_with(r_sym, '##')
       |                             THEN substr(r_sym, 3) ELSE r_sym END) AS merged
       |       FROM p$i JOIN y$i sl ON p$i.l_sym = sl.sym JOIN y$i sr ON p$i.r_sym = sr.sym
       |       ORDER BY score_e12 DESC, l_sym, r_sym LIMIT 1),
       |r$i AS (SELECT replace(rep,
       |         '|' || (SELECT l_sym FROM b$i) || '||' || (SELECT r_sym FROM b$i) || '|',
       |         '|' || (SELECT merged FROM b$i) || '|') AS rep, wc
       |       FROM $prev)""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    // q312: the q294 closed form — greedy takes exactly every
    // occurrence of the char-disjoint pieces, n_tokens = len − Σocc —
    // EXCEPT words over HF's max_input_chars_per_word=100 (DuckDB len()
    // counts code points, as does the kernel's codePointCount), which
    // degrade to one [UNK]; the planted 120-char mega-word exercises it.
    "q312_wordpiece_tokens" -> """
      WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT 1000001, 'the ' || repeat('th', 60) || ' on'),
      w AS (
        SELECT doc_id, w FROM (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
          FROM docs)
        WHERE len(w) > 0),
      o AS (SELECT doc_id,
              CAST(sum(CASE WHEN len(w) > 100 THEN 1
                ELSE len(w) - ((len(w) - len(replace(w, 'th', ''))) // 2
                             + (len(w) - len(replace(w, 'er', ''))) // 2
                             + (len(w) - len(replace(w, 'on', ''))) // 2)
                END) AS BIGINT) AS n_tokens,
              CAST(sum(CASE WHEN len(w) > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk_words,
              CAST(count(*) AS BIGINT) AS n_words
            FROM w GROUP BY doc_id)
      SELECT d.doc_id,
             CAST(coalesce(o.n_tokens, 0) AS BIGINT) AS n_tokens,
             CAST(coalesce(o.n_unk_words, 0) AS BIGINT) AS n_unk_words,
             CAST(coalesce(o.n_words, 0) AS BIGINT) AS n_words
      FROM docs d LEFT JOIN o USING (doc_id)
      ORDER BY d.doc_id""",

    // q319: a word is UNK iff it contains q/x/z (the gapped alphabet) OR
    // exceeds HF's 100-code-point cutoff (the planted mega-word);
    // covered words tokenize by the q312 occurrence formula; per-lang
    // exact sums, the rate rounded at 4 off one division.
    "q319_wordpiece_card" -> """
      WITH alldocs AS (
        SELECT doc_id, lang, text FROM documents
        UNION ALL SELECT 1000001, 'en', 'the ' || repeat('th', 60) || ' on'),
      w AS (
        SELECT doc_id, w FROM (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
          FROM alldocs)
        WHERE len(w) > 0),
      per AS (SELECT d.lang,
                CASE WHEN len(w.w) > 100 OR regexp_matches(w.w, '[qxz]') THEN 1
                     ELSE 0 END AS unk,
                CASE WHEN len(w.w) > 100 OR regexp_matches(w.w, '[qxz]') THEN 1
                     ELSE len(w.w) - ((len(w.w) - len(replace(w.w, 'th', ''))) // 2
                                    + (len(w.w) - len(replace(w.w, 'er', ''))) // 2
                                    + (len(w.w) - len(replace(w.w, 'on', ''))) // 2)
                END AS toks
              FROM w JOIN alldocs d USING (doc_id)),
      agg AS (SELECT lang,
                CAST(count(*) AS BIGINT) AS total_words,
                CAST(sum(toks) AS BIGINT) AS total_tokens,
                CAST(sum(unk) AS BIGINT) AS total_unk_words
              FROM per GROUP BY lang),
      docs AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
               FROM alldocs GROUP BY lang)
      SELECT d.lang, d.n_docs, a.total_words, a.total_tokens, a.total_unk_words,
             round(CAST(a.total_unk_words AS DOUBLE)
                   / CAST(a.total_words AS DOUBLE), 4) AS unk_rate
      FROM docs d JOIN agg a USING (lang)
      ORDER BY d.lang""",

    // q320: q319's closed form WITHOUT the lang grouping — the global
    // totals the drained readout must reproduce bit for bit (length
    // cutoff and planted mega-word included).
    "q320_streaming_wordpiece" -> """
      WITH alldocs AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT 1000001, 'the ' || repeat('th', 60) || ' on'),
      w AS (
        SELECT doc_id, w FROM (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
          FROM alldocs)
        WHERE len(w) > 0),
      per AS (SELECT
                CASE WHEN len(w) > 100 OR regexp_matches(w, '[qxz]') THEN 1 ELSE 0 END AS unk,
                CASE WHEN len(w) > 100 OR regexp_matches(w, '[qxz]') THEN 1
                     ELSE len(w) - ((len(w) - len(replace(w, 'th', ''))) // 2
                                  + (len(w) - len(replace(w, 'er', ''))) // 2
                                  + (len(w) - len(replace(w, 'on', ''))) // 2)
                END AS toks
              FROM w)
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM alldocs) AS n_docs,
             CAST(count(*) AS BIGINT) AS total_words,
             CAST(sum(toks) AS BIGINT) AS total_tokens,
             CAST(sum(unk) AS BIGINT) AS total_unk_words,
             round(CAST(sum(unk) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS unk_rate
      FROM per""",

    // q331: q162's CTE shape with the Kneser-Ney formula — discounted
    // bigram mass, continuation-count backoff, add-k continuation
    // smoothing as the OOV guard; the float expression replayed
    // literally.
    "q331_kneser_ney_ppl" -> """
      WITH tr AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
                  WHERE doc_id % 2 = 0),
      sc AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
             WHERE doc_id % 2 = 1),
      trbg AS (SELECT w[p] AS w1, w[p + 1] AS w2
               FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS p
                     FROM tr WHERE len(w) >= 2)),
      c12 AS (SELECT w1, w2, count(*) AS c12 FROM trbg GROUP BY w1, w2),
      c1 AS (SELECT w1, count(*) AS c1 FROM trbg GROUP BY w1),
      n1l AS (SELECT w1, count(DISTINCT w2) AS n1l FROM trbg GROUP BY w1),
      n1r AS (SELECT w2, count(DISTINCT w1) AS n1r FROM trbg GROUP BY w2),
      tot AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM c12) AS tt,
                     (SELECT CAST(count(DISTINCT t) AS DOUBLE)
                      FROM (SELECT unnest(w) AS t FROM tr)) AS v),
      scbg AS (SELECT doc_id, w[p] AS w1, w[p + 1] AS w2
               FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS p
                     FROM sc WHERE len(w) >= 2)),
      scored AS (
        SELECT scbg.doc_id, count(*) AS n_bigrams,
               exp(-avg(ln(
                 CASE WHEN coalesce(c1.c1, 0) > 0
                      THEN greatest(CAST(coalesce(c12.c12, 0) AS DOUBLE) - 0.75, 0.0)
                             / c1.c1
                           + 0.75 * n1l.n1l / c1.c1
                             * ((coalesce(n1r.n1r, 0) + 1.0) / (tot.tt + 1.0 * tot.v))
                      ELSE (coalesce(n1r.n1r, 0) + 1.0) / (tot.tt + 1.0 * tot.v)
                 END))) AS ppl
        FROM scbg LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1)
             LEFT JOIN n1l USING (w1) LEFT JOIN n1r USING (w2) CROSS JOIN tot
        GROUP BY scbg.doc_id)
      SELECT d.doc_id,
             CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             round(s.ppl, 4) AS ppl
      FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
           LEFT JOIN scored s USING (doc_id)
      ORDER BY d.doc_id""",

    // q332: the trigram-KN count tables and the two-level backoff
    // expression transcribed literally (the q331 discipline).
    "q332_kn_trigram_ppl" -> """
      WITH tr AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
                  WHERE doc_id % 2 = 0),
      sc AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
             WHERE doc_id % 2 = 1),
      trtg AS (SELECT w[p] AS w1, w[p + 1] AS w2, w[p + 2] AS w3
               FROM (SELECT w, unnest(generate_series(1, len(w) - 2)) AS p
                     FROM tr WHERE len(w) >= 3)),
      c123 AS (SELECT w1, w2, w3, count(*) AS c123 FROM trtg GROUP BY w1, w2, w3),
      ctx12 AS (SELECT w1, w2, count(*) AS ctx12 FROM trtg GROUP BY w1, w2),
      n3 AS (SELECT w1, w2, count(DISTINCT w3) AS n3 FROM trtg GROUP BY w1, w2),
      n12 AS (SELECT w2, w3, count(DISTINCT w1) AS n12 FROM trtg GROUP BY w2, w3),
      nctx2 AS (SELECT w2, sum(n12) AS nctx2 FROM n12 GROUP BY w2),
      nl2 AS (SELECT w2, count(*) AS nl2 FROM n12 GROUP BY w2),
      trbg AS (SELECT w[p] AS w2, w[p + 1] AS w3
               FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS p
                     FROM tr WHERE len(w) >= 2)),
      n1r AS (SELECT w3, count(DISTINCT w2) AS n1r FROM trbg GROUP BY w3),
      tot AS (SELECT (SELECT CAST(count(*) AS DOUBLE)
                      FROM (SELECT DISTINCT w2, w3 FROM trbg)) AS tt,
                     (SELECT CAST(count(DISTINCT t) AS DOUBLE)
                      FROM (SELECT unnest(w) AS t FROM tr)) AS v),
      sctg AS (SELECT doc_id, w[p] AS w1, w[p + 1] AS w2, w[p + 2] AS w3
               FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS p
                     FROM sc WHERE len(w) >= 3)),
      scored AS (
        SELECT sctg.doc_id, count(*) AS n_trigrams,
               exp(-avg(ln(
                 CASE WHEN coalesce(ctx12.ctx12, 0) > 0
                      THEN greatest(CAST(coalesce(c123.c123, 0) AS DOUBLE) - 0.75, 0.0)
                             / ctx12.ctx12
                           + 0.75 * n3.n3 / ctx12.ctx12
                             * (CASE WHEN coalesce(nctx2.nctx2, 0) > 0
                                     THEN greatest(CAST(coalesce(n12.n12, 0) AS DOUBLE) - 0.75, 0.0)
                                            / nctx2.nctx2
                                          + 0.75 * nl2.nl2 / nctx2.nctx2
                                            * ((coalesce(n1r.n1r, 0) + 1.0)
                                               / (tot.tt + 1.0 * tot.v))
                                     ELSE (coalesce(n1r.n1r, 0) + 1.0)
                                          / (tot.tt + 1.0 * tot.v) END)
                      ELSE (CASE WHEN coalesce(nctx2.nctx2, 0) > 0
                                 THEN greatest(CAST(coalesce(n12.n12, 0) AS DOUBLE) - 0.75, 0.0)
                                        / nctx2.nctx2
                                      + 0.75 * nl2.nl2 / nctx2.nctx2
                                        * ((coalesce(n1r.n1r, 0) + 1.0)
                                           / (tot.tt + 1.0 * tot.v))
                                 ELSE (coalesce(n1r.n1r, 0) + 1.0)
                                      / (tot.tt + 1.0 * tot.v) END)
                 END))) AS ppl
        FROM sctg LEFT JOIN c123 USING (w1, w2, w3) LEFT JOIN ctx12 USING (w1, w2)
             LEFT JOIN n3 USING (w1, w2) LEFT JOIN n12 USING (w2, w3)
             LEFT JOIN nctx2 USING (w2) LEFT JOIN nl2 USING (w2)
             LEFT JOIN n1r USING (w3) CROSS JOIN tot
        GROUP BY sctg.doc_id)
      SELECT d.doc_id,
             CAST(coalesce(s.n_trigrams, 0) AS BIGINT) AS n_trigrams,
             round(s.ppl, 4) AS ppl
      FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
           LEFT JOIN scored s USING (doc_id)
      ORDER BY d.doc_id""",

    // q313: the greedy consumption unrolled as an 8-stage positional
    // machine over the planted words (a word of <= 8 chars consumes at
    // most 8 pieces), UNK latched on the first unmatchable position.
    "q313_wordpiece_greedy" -> s"""
      WITH base AS (
        SELECT doc_id,
               substr(c0||c1||c2||c3||c4||c5||c6||c7, 1, CAST(4 + doc_id % 5 AS INTEGER)) AS w
        FROM (SELECT doc_id,
                ${(0 to 7).map(k =>
                  s"CASE WHEN (doc_id // ${1 << k}) % 2 = 0 THEN 'a' ELSE 'b' END AS c$k")
                  .mkString(",\n                ")}
              FROM documents)),
      g0 AS (SELECT doc_id, w, len(w) AS wlen, 1 AS pos, 0 AS toks, false AS unk FROM base),
      ${(1 to 8).map(wpGreedyStage).mkString(",\n      ")}
      SELECT doc_id,
             CAST(CASE WHEN unk THEN 1 ELSE toks END AS BIGINT) AS n_tokens,
             unk AS is_unk
      FROM g8 ORDER BY doc_id""",

    // q314: both training iterations unrolled — ##-marked reps, pair +
    // symbol recounts per iteration, HUGEINT quantized-ratio argmax with
    // the (score desc, l, r) tie-break, WordPiece's ##-stripping merge.
    "q314_wordpiece_train" -> s"""
      WITH words AS (
        SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
          SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
          FROM documents)
        WHERE len(w) > 0 GROUP BY w),
      r0 AS (SELECT CASE WHEN len(w) <= 1 THEN '|' || w || '|'
                    ELSE '|' || substr(w, 1, 1) || '|'
                         || regexp_replace(substr(w, 2), '(.)', '|##\\1|', 'g')
                    END AS rep, wc FROM words),
      ${Seq(1, 2).map(wpTrainIter).mkString(",\n      ")}
      SELECT * FROM (
        SELECT 1 AS iter, l_sym, r_sym, merged, pair_count, l_count, r_count, score_e12 FROM b1
        UNION ALL
        SELECT 2, l_sym, r_sym, merged, pair_count, l_count, r_count, score_e12 FROM b2)
      ORDER BY iter""",

    "q57_pii_redaction" -> piiOracle,

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

    "q121_span_corruption" -> spanCorruptionOracle,

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
    // q271: exact integer count-of-counts, the two ratios on the grid.
    "q271_coverage_card" -> """
      WITH c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
                 FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
                 WHERE len(tok) > 0 GROUP BY tok),
      s AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS vocab,
                   CAST(count(*) FILTER (WHERE cnt = 1) AS BIGINT) AS n1,
                   CAST(count(*) FILTER (WHERE cnt = 2) AS BIGINT) AS n2
            FROM c)
      SELECT n_tokens, vocab, n1, n2,
             CAST(floor(CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                  * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS unseen_mass,
             CAST(floor(CAST(n1 AS DOUBLE) / CAST(vocab AS DOUBLE)
                  * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS hapax_share
      FROM s""",

    "q56_chunking" -> chunkingOracle,
    "q60_packing" -> packingOracle,

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

    // q294: per-word piece occurrences have a closed form (see the query
    // comment): score = -3e6*len + 5e5*occ, tokens = len - occ, occ
    // counted per piece on the ORIGINAL word via replace().
    "q294_unigram_tokens" -> """
      WITH w AS (
        SELECT doc_id, w FROM (
          SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
          FROM documents)
        WHERE len(w) > 0),
      o AS (SELECT doc_id,
              CAST(sum(-3000000 * len(w)
                + 500000 * ((len(w) - len(replace(w, 'th', ''))) // 2
                          + (len(w) - len(replace(w, 'er', ''))) // 2
                          + (len(w) - len(replace(w, 'on', ''))) // 2)) AS BIGINT) AS score_micro,
              CAST(sum(len(w) - ((len(w) - len(replace(w, 'th', ''))) // 2
                               + (len(w) - len(replace(w, 'er', ''))) // 2
                               + (len(w) - len(replace(w, 'on', ''))) // 2)) AS BIGINT) AS n_tokens,
              CAST(count(*) AS BIGINT) AS n_words
            FROM w GROUP BY doc_id)
      SELECT d.doc_id,
             CAST(coalesce(o.score_micro, 0) AS BIGINT) AS score_micro,
             CAST(coalesce(o.n_tokens, 0) AS BIGINT) AS n_tokens,
             CAST(coalesce(o.n_words, 0) AS BIGINT) AS n_words
      FROM documents d LEFT JOIN o USING (doc_id)
      ORDER BY d.doc_id""",

    // q295: the Viterbi DP unrolled positionally (max score, then min
    // tokens per prefix) over the planted 4..8-char binary-expansion
    // words -- generated mechanically, verified against an independent
    // reference DP over all 500 sf0.001 ids.
    "q295_unigram_viterbi" -> """
      WITH base AS (
        SELECT doc_id,
               substr(c0||c1||c2||c3||c4||c5||c6||c7, 1, CAST(4 + doc_id % 5 AS INTEGER)) AS w
        FROM (SELECT doc_id,
                CASE WHEN (doc_id // 1) % 2 = 0 THEN 'a' ELSE 'b' END AS c0,
                CASE WHEN (doc_id // 2) % 2 = 0 THEN 'a' ELSE 'b' END AS c1,
                CASE WHEN (doc_id // 4) % 2 = 0 THEN 'a' ELSE 'b' END AS c2,
                CASE WHEN (doc_id // 8) % 2 = 0 THEN 'a' ELSE 'b' END AS c3,
                CASE WHEN (doc_id // 16) % 2 = 0 THEN 'a' ELSE 'b' END AS c4,
                CASE WHEN (doc_id // 32) % 2 = 0 THEN 'a' ELSE 'b' END AS c5,
                CASE WHEN (doc_id // 64) % 2 = 0 THEN 'a' ELSE 'b' END AS c6,
                CASE WHEN (doc_id // 128) % 2 = 0 THEN 'a' ELSE 'b' END AS c7
              FROM documents)),
      d0 AS (SELECT doc_id, w, CAST(0 AS BIGINT) AS s0, 0 AS t0 FROM base),
      e1 AS (SELECT *,
         s0 + (CASE substr(w,1,1) WHEN 'a' THEN -3000000 WHEN 'b' THEN -3100000 END) AS a1
       FROM d0),
      f1 AS (SELECT *, coalesce(a1,-900000000000000) AS s1 FROM e1),
      d1 AS (SELECT *, CASE WHEN a1 = s1 THEN t0 + 1 ELSE 9999 END AS t1 FROM f1),
      e2 AS (SELECT *,
         s1 + (CASE substr(w,2,1) WHEN 'a' THEN -3000000 WHEN 'b' THEN -3100000 END) AS a2,
         s0 + (CASE substr(w,1,2) WHEN 'ab' THEN -5500000 WHEN 'ba' THEN -5400000 WHEN 'aa' THEN -5900000 END) AS b2
       FROM d1),
      f2 AS (SELECT *, greatest(coalesce(a2,-900000000000000), coalesce(b2,-900000000000000)) AS s2 FROM e2),
      d2 AS (SELECT *, least(CASE WHEN a2 = s2 THEN t1 + 1 ELSE 9999 END, CASE WHEN b2 = s2 THEN t0 + 1 ELSE 9999 END) AS t2 FROM f2),
      e3 AS (SELECT *,
         s2 + (CASE substr(w,3,1) WHEN 'a' THEN -3000000 WHEN 'b' THEN -3100000 END) AS a3,
         s1 + (CASE substr(w,2,2) WHEN 'ab' THEN -5500000 WHEN 'ba' THEN -5400000 WHEN 'aa' THEN -5900000 END) AS b3,
         s0 + (CASE substr(w,1,3) WHEN 'bab' THEN -8000000 WHEN 'aab' THEN -8100000 END) AS c3
       FROM d2),
      f3 AS (SELECT *, greatest(coalesce(a3,-900000000000000), coalesce(b3,-900000000000000), coalesce(c3,-900000000000000)) AS s3 FROM e3),
      d3 AS (SELECT *, least(CASE WHEN a3 = s3 THEN t2 + 1 ELSE 9999 END, CASE WHEN b3 = s3 THEN t1 + 1 ELSE 9999 END, CASE WHEN c3 = s3 THEN t0 + 1 ELSE 9999 END) AS t3 FROM f3),
      e4 AS (SELECT *,
         s3 + (CASE substr(w,4,1) WHEN 'a' THEN -3000000 WHEN 'b' THEN -3100000 END) AS a4,
         s2 + (CASE substr(w,3,2) WHEN 'ab' THEN -5500000 WHEN 'ba' THEN -5400000 WHEN 'aa' THEN -5900000 END) AS b4,
         s1 + (CASE substr(w,2,3) WHEN 'bab' THEN -8000000 WHEN 'aab' THEN -8100000 END) AS c4
       FROM d3),
      f4 AS (SELECT *, greatest(coalesce(a4,-900000000000000), coalesce(b4,-900000000000000), coalesce(c4,-900000000000000)) AS s4 FROM e4),
      d4 AS (SELECT *, least(CASE WHEN a4 = s4 THEN t3 + 1 ELSE 9999 END, CASE WHEN b4 = s4 THEN t2 + 1 ELSE 9999 END, CASE WHEN c4 = s4 THEN t1 + 1 ELSE 9999 END) AS t4 FROM f4),
      e5 AS (SELECT *,
         s4 + (CASE substr(w,5,1) WHEN 'a' THEN -3000000 WHEN 'b' THEN -3100000 END) AS a5,
         s3 + (CASE substr(w,4,2) WHEN 'ab' THEN -5500000 WHEN 'ba' THEN -5400000 WHEN 'aa' THEN -5900000 END) AS b5,
         s2 + (CASE substr(w,3,3) WHEN 'bab' THEN -8000000 WHEN 'aab' THEN -8100000 END) AS c5
       FROM d4),
      f5 AS (SELECT *, greatest(coalesce(a5,-900000000000000), coalesce(b5,-900000000000000), coalesce(c5,-900000000000000)) AS s5 FROM e5),
      d5 AS (SELECT *, least(CASE WHEN a5 = s5 THEN t4 + 1 ELSE 9999 END, CASE WHEN b5 = s5 THEN t3 + 1 ELSE 9999 END, CASE WHEN c5 = s5 THEN t2 + 1 ELSE 9999 END) AS t5 FROM f5),
      e6 AS (SELECT *,
         s5 + (CASE substr(w,6,1) WHEN 'a' THEN -3000000 WHEN 'b' THEN -3100000 END) AS a6,
         s4 + (CASE substr(w,5,2) WHEN 'ab' THEN -5500000 WHEN 'ba' THEN -5400000 WHEN 'aa' THEN -5900000 END) AS b6,
         s3 + (CASE substr(w,4,3) WHEN 'bab' THEN -8000000 WHEN 'aab' THEN -8100000 END) AS c6
       FROM d5),
      f6 AS (SELECT *, greatest(coalesce(a6,-900000000000000), coalesce(b6,-900000000000000), coalesce(c6,-900000000000000)) AS s6 FROM e6),
      d6 AS (SELECT *, least(CASE WHEN a6 = s6 THEN t5 + 1 ELSE 9999 END, CASE WHEN b6 = s6 THEN t4 + 1 ELSE 9999 END, CASE WHEN c6 = s6 THEN t3 + 1 ELSE 9999 END) AS t6 FROM f6),
      e7 AS (SELECT *,
         s6 + (CASE substr(w,7,1) WHEN 'a' THEN -3000000 WHEN 'b' THEN -3100000 END) AS a7,
         s5 + (CASE substr(w,6,2) WHEN 'ab' THEN -5500000 WHEN 'ba' THEN -5400000 WHEN 'aa' THEN -5900000 END) AS b7,
         s4 + (CASE substr(w,5,3) WHEN 'bab' THEN -8000000 WHEN 'aab' THEN -8100000 END) AS c7
       FROM d6),
      f7 AS (SELECT *, greatest(coalesce(a7,-900000000000000), coalesce(b7,-900000000000000), coalesce(c7,-900000000000000)) AS s7 FROM e7),
      d7 AS (SELECT *, least(CASE WHEN a7 = s7 THEN t6 + 1 ELSE 9999 END, CASE WHEN b7 = s7 THEN t5 + 1 ELSE 9999 END, CASE WHEN c7 = s7 THEN t4 + 1 ELSE 9999 END) AS t7 FROM f7),
      e8 AS (SELECT *,
         s7 + (CASE substr(w,8,1) WHEN 'a' THEN -3000000 WHEN 'b' THEN -3100000 END) AS a8,
         s6 + (CASE substr(w,7,2) WHEN 'ab' THEN -5500000 WHEN 'ba' THEN -5400000 WHEN 'aa' THEN -5900000 END) AS b8,
         s5 + (CASE substr(w,6,3) WHEN 'bab' THEN -8000000 WHEN 'aab' THEN -8100000 END) AS c8
       FROM d7),
      f8 AS (SELECT *, greatest(coalesce(a8,-900000000000000), coalesce(b8,-900000000000000), coalesce(c8,-900000000000000)) AS s8 FROM e8),
      d8 AS (SELECT *, least(CASE WHEN a8 = s8 THEN t7 + 1 ELSE 9999 END, CASE WHEN b8 = s8 THEN t6 + 1 ELSE 9999 END, CASE WHEN c8 = s8 THEN t5 + 1 ELSE 9999 END) AS t8 FROM f8),
      fin AS (SELECT doc_id, len(w) AS n,
        CASE len(w) WHEN 4 THEN s4 WHEN 5 THEN s5 WHEN 6 THEN s6 WHEN 7 THEN s7 ELSE s8 END AS sc,
        CASE len(w) WHEN 4 THEN t4 WHEN 5 THEN t5 WHEN 6 THEN t6 WHEN 7 THEN t7 ELSE t8 END AS tk
        FROM d8)
      SELECT doc_id, CAST(sc AS BIGINT) AS score_micro, CAST(tk AS BIGINT) AS n_tokens
      FROM fin ORDER BY doc_id""",

    // q301: q294's per-word closed form grouped by lang; n_docs counted
    // over ALL documents (wordless docs still sit in the card).
    "q301_unigram_transfer_card" -> """
      WITH w AS (
        SELECT lang, w FROM (
          SELECT lang, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
          FROM documents)
        WHERE len(w) > 0),
      p AS (SELECT lang, len(w) AS n,
              (len(w) - len(replace(w, 'th', ''))) // 2
            + (len(w) - len(replace(w, 'er', ''))) // 2
            + (len(w) - len(replace(w, 'on', ''))) // 2 AS occ
            FROM w),
      t AS (SELECT lang,
              CAST(sum(-3000000 * n + 500000 * occ) AS BIGINT) AS total_score_micro,
              CAST(sum(n - occ) AS BIGINT) AS total_tokens,
              CAST(count(*) AS BIGINT) AS total_words
            FROM p GROUP BY lang),
      d AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY lang)
      SELECT d.lang, d.n_docs,
             CAST(coalesce(t.total_words, 0) AS BIGINT) AS total_words,
             CAST(coalesce(t.total_tokens, 0) AS BIGINT) AS total_tokens,
             CAST(coalesce(t.total_score_micro, 0) AS BIGINT) AS total_score_micro,
             round(t.total_tokens * 1.0 / t.total_words, 4) AS tokens_per_word
      FROM d LEFT JOIN t USING (lang)
      ORDER BY d.lang""",

    // q302: the q294 closed form's GLOBAL totals — the drained monitor's
    // readout must land on them exactly.
    "q302_streaming_unigram" -> """
      WITH w AS (
        SELECT w FROM (
          SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
          FROM documents)
        WHERE len(w) > 0),
      p AS (SELECT len(w) AS n,
              (len(w) - len(replace(w, 'th', ''))) // 2
            + (len(w) - len(replace(w, 'er', ''))) // 2
            + (len(w) - len(replace(w, 'on', ''))) // 2 AS occ
            FROM w),
      t AS (SELECT
              CAST(sum(-3000000 * n + 500000 * occ) AS BIGINT) AS total_score_micro,
              CAST(sum(n - occ) AS BIGINT) AS total_tokens,
              CAST(count(*) AS BIGINT) AS total_words
            FROM p),
      d AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
      SELECT d.n_docs, t.total_words, t.total_tokens, t.total_score_micro,
             round(t.total_tokens * 1.0 / t.total_words, 4) AS tokens_per_word
      FROM d, t""",

    // q305: q101's chain + the inlined per-(word, merge) drop predicate
    // on the shared md5 keyHash grid.
    "q305_bpe_dropout" -> """
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
                 '|'), '||')))), 0) AS INTEGER) AS n_bpe_tokens,
             CAST(coalesce(list_sum(list_transform(
               [x for x in regexp_split_to_array(lower(d.text), '[^a-z0-9]+')
                  if len(x) > 0],
               w -> len(string_split(trim(
                 CASE WHEN CAST(concat('0x', substring(md5('ep1' || w || '#1'), 1, 15)) AS BIGINT) % 1000000 >= 500000 THEN replace(CASE WHEN CAST(concat('0x', substring(md5('ep1' || w || '#0'), 1, 15)) AS BIGINT) % 1000000 >= 500000 THEN replace(regexp_replace(w, '(.)', '|\1|', 'g'), f1, m1) ELSE regexp_replace(w, '(.)', '|\1|', 'g') END, f2, m2) ELSE CASE WHEN CAST(concat('0x', substring(md5('ep1' || w || '#0'), 1, 15)) AS BIGINT) % 1000000 >= 500000 THEN replace(regexp_replace(w, '(.)', '|\1|', 'g'), f1, m1) ELSE regexp_replace(w, '(.)', '|\1|', 'g') END END,
                 '|'), '||')))), 0) AS INTEGER) AS n_dropout_tokens
      FROM documents d CROSS JOIN pats ORDER BY d.doc_id""",

    // q306: q304's enumeration + pick, packed by one global cumsum.
    "q306_sampled_packing" -> """
      WITH RECURSIVE base AS (
        SELECT doc_id,
               substr(c0||c1||c2||c3||c4||c5||c6||c7, 1, CAST(4 + doc_id % 5 AS INTEGER)) AS w
        FROM (SELECT doc_id,
                CASE WHEN (doc_id // 1) % 2 = 0 THEN 'a' ELSE 'b' END AS c0,
                CASE WHEN (doc_id // 2) % 2 = 0 THEN 'a' ELSE 'b' END AS c1,
                CASE WHEN (doc_id // 4) % 2 = 0 THEN 'a' ELSE 'b' END AS c2,
                CASE WHEN (doc_id // 8) % 2 = 0 THEN 'a' ELSE 'b' END AS c3,
                CASE WHEN (doc_id // 16) % 2 = 0 THEN 'a' ELSE 'b' END AS c4,
                CASE WHEN (doc_id // 32) % 2 = 0 THEN 'a' ELSE 'b' END AS c5,
                CASE WHEN (doc_id // 64) % 2 = 0 THEN 'a' ELSE 'b' END AS c6,
                CASE WHEN (doc_id // 128) % 2 = 0 THEN 'a' ELSE 'b' END AS c7
              FROM documents)),
      paths AS (
        SELECT doc_id, w, 0 AS pos, CAST(0 AS BIGINT) AS score, 0 AS tk, '' AS lenstr
        FROM base
        UNION ALL
        SELECT p.doc_id, p.w, p.pos + lens.l,
               p.score + CASE lens.l
                 WHEN 1 THEN CASE substr(p.w, p.pos + 1, 1)
                               WHEN 'a' THEN -3000000 WHEN 'b' THEN -3100000 END
                 WHEN 2 THEN CASE substr(p.w, p.pos + 1, 2)
                               WHEN 'ab' THEN -5500000 WHEN 'ba' THEN -5400000
                               WHEN 'aa' THEN -5900000 END
                 WHEN 3 THEN CASE substr(p.w, p.pos + 1, 3)
                               WHEN 'bab' THEN -8000000 WHEN 'aab' THEN -8100000 END
               END,
               p.tk + 1, p.lenstr || CAST(lens.l AS VARCHAR)
        FROM paths p, (VALUES (1), (2), (3)) AS lens(l)
        WHERE p.pos + lens.l <= len(p.w)
          AND CASE lens.l
                WHEN 1 THEN substr(p.w, p.pos + 1, 1) IN ('a', 'b')
                WHEN 2 THEN substr(p.w, p.pos + 1, 2) IN ('ab', 'ba', 'aa')
                WHEN 3 THEN substr(p.w, p.pos + 1, 3) IN ('bab', 'aab')
              END),
      done AS (SELECT doc_id, score, tk, reverse(lenstr) AS key
               FROM paths WHERE pos = len(w)),
      ranked AS (SELECT doc_id, score, tk,
                        row_number() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, tk, key DESC) AS rnk
                 FROM done),
      cnt AS (SELECT doc_id, least(3, count(*)) AS m FROM done GROUP BY doc_id),
      pick AS (SELECT r.doc_id, r.score, r.tk
               FROM ranked r
               JOIN cnt c ON c.doc_id = r.doc_id
               JOIN base b ON b.doc_id = r.doc_id
               WHERE r.rnk = (CAST(concat('0x', substring(md5('aug1' || b.w), 1, 15)) AS BIGINT) % c.m) + 1)
      SELECT doc_id, CAST(tk AS BIGINT) AS n_tokens,
             CAST((sum(tk) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - tk) // 16
               AS BIGINT) AS pack_id
      FROM pick ORDER BY doc_id""",

    // q307: decode (the q303 enumeration, rank 1 with the length string
    // kept), piece extraction by running offsets, counts, then a SECOND
    // enumeration over the counted pieces' own strings (tk >= 2 = the
    // piece itself masked; single chars fall to the unk floor) and the
    // (loss desc, piece asc) keep ranking at vocabSize 4. All seven
    // vocabulary pieces appear in this corpus's decode (verified), so
    // the observed and full vocabularies coincide.
    "q307_unigram_prune_loss" -> """
      WITH RECURSIVE base AS (
        SELECT doc_id,
               substr(c0||c1||c2||c3||c4||c5||c6||c7, 1, CAST(4 + doc_id % 5 AS INTEGER)) AS w
        FROM (SELECT doc_id,
                CASE WHEN (doc_id // 1) % 2 = 0 THEN 'a' ELSE 'b' END AS c0,
                CASE WHEN (doc_id // 2) % 2 = 0 THEN 'a' ELSE 'b' END AS c1,
                CASE WHEN (doc_id // 4) % 2 = 0 THEN 'a' ELSE 'b' END AS c2,
                CASE WHEN (doc_id // 8) % 2 = 0 THEN 'a' ELSE 'b' END AS c3,
                CASE WHEN (doc_id // 16) % 2 = 0 THEN 'a' ELSE 'b' END AS c4,
                CASE WHEN (doc_id // 32) % 2 = 0 THEN 'a' ELSE 'b' END AS c5,
                CASE WHEN (doc_id // 64) % 2 = 0 THEN 'a' ELSE 'b' END AS c6,
                CASE WHEN (doc_id // 128) % 2 = 0 THEN 'a' ELSE 'b' END AS c7
              FROM documents)),
      paths AS (
        SELECT doc_id, w, 0 AS pos, CAST(0 AS BIGINT) AS score, 0 AS tk, '' AS lenstr
        FROM base
        UNION ALL
        SELECT p.doc_id, p.w, p.pos + lens.l,
               p.score + CASE lens.l
           WHEN 1 THEN CASE substr(p.w, p.pos + 1, 1)
                         WHEN 'a' THEN -3000000 WHEN 'b' THEN -3100000 END
           WHEN 2 THEN CASE substr(p.w, p.pos + 1, 2)
                         WHEN 'ab' THEN -5500000 WHEN 'ba' THEN -5400000
                         WHEN 'aa' THEN -5900000 END
           WHEN 3 THEN CASE substr(p.w, p.pos + 1, 3)
                         WHEN 'bab' THEN -8000000 WHEN 'aab' THEN -8100000 END
         END,
               p.tk + 1, p.lenstr || CAST(lens.l AS VARCHAR)
        FROM paths p, (VALUES (1), (2), (3)) AS lens(l)
        WHERE p.pos + lens.l <= len(p.w)
          AND CASE lens.l
          WHEN 1 THEN substr(p.w, p.pos + 1, 1) IN ('a', 'b')
          WHEN 2 THEN substr(p.w, p.pos + 1, 2) IN ('ab', 'ba', 'aa')
          WHEN 3 THEN substr(p.w, p.pos + 1, 3) IN ('bab', 'aab')
        END),
      r1 AS (SELECT doc_id, w, lenstr FROM (
               SELECT doc_id, w, lenstr,
                      row_number() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, tk, reverse(lenstr) DESC) AS rnk
               FROM paths WHERE pos = len(w)) WHERE rnk = 1),
      pp AS (SELECT doc_id, w, lenstr, unnest(generate_series(1, len(lenstr))) AS i FROM r1),
      px0 AS (SELECT doc_id, w, i,
                     CAST(substr(lenstr, CAST(i AS INTEGER), 1) AS INTEGER) AS l
              FROM pp),
      px AS (SELECT doc_id, w, i, l,
                    coalesce(sum(l) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
             FROM px0),
      counts AS (SELECT substr(w, CAST(st + 1 AS INTEGER), l) AS piece,
                        CAST(count(*) AS BIGINT) AS cnt
                 FROM px GROUP BY 1),
      lps AS (SELECT * FROM (VALUES ('a', -3000000), ('b', -3100000),
                ('ab', -5500000), ('ba', -5400000), ('aa', -5900000),
                ('bab', -8000000), ('aab', -8100000)) AS t(piece, lp)),
      paths2 AS (
        SELECT piece AS w, 0 AS pos, CAST(0 AS BIGINT) AS score, 0 AS tk, '' AS lenstr
        FROM counts WHERE len(piece) > 1
        UNION ALL
        SELECT p.w, p.pos + lens.l,
               p.score + CASE lens.l
           WHEN 1 THEN CASE substr(p.w, p.pos + 1, 1)
                         WHEN 'a' THEN -3000000 WHEN 'b' THEN -3100000 END
           WHEN 2 THEN CASE substr(p.w, p.pos + 1, 2)
                         WHEN 'ab' THEN -5500000 WHEN 'ba' THEN -5400000
                         WHEN 'aa' THEN -5900000 END
           WHEN 3 THEN CASE substr(p.w, p.pos + 1, 3)
                         WHEN 'bab' THEN -8000000 WHEN 'aab' THEN -8100000 END
         END,
               p.tk + 1, p.lenstr || CAST(lens.l AS VARCHAR)
        FROM paths2 p, (VALUES (1), (2), (3)) AS lens(l)
        WHERE p.pos + lens.l <= len(p.w)
          AND CASE lens.l
          WHEN 1 THEN substr(p.w, p.pos + 1, 1) IN ('a', 'b')
          WHEN 2 THEN substr(p.w, p.pos + 1, 2) IN ('ab', 'ba', 'aa')
          WHEN 3 THEN substr(p.w, p.pos + 1, 3) IN ('bab', 'aab')
        END),
      alt AS (SELECT w AS piece, max(score) AS alt_raw
              FROM paths2 WHERE pos = len(w) AND tk >= 2 GROUP BY w),
      tbl AS (SELECT c.piece, c.cnt,
                     CAST(l.lp AS BIGINT) AS lp_micro,
                     CAST(CASE WHEN len(c.piece) = 1 THEN -30000000
                               ELSE a.alt_raw END AS BIGINT) AS alt_micro
              FROM counts c JOIN lps l ON l.piece = c.piece
              LEFT JOIN alt a ON a.piece = c.piece),
      lossed AS (SELECT piece, cnt AS count, lp_micro, alt_micro,
                        cnt * (lp_micro - alt_micro) AS loss_micro
                 FROM tbl),
      budget AS (SELECT greatest(0, 4 - count(*) FILTER (WHERE len(piece) = 1)) AS b
                 FROM lossed),
      ranked AS (SELECT piece,
                        row_number() OVER (ORDER BY loss_micro DESC, piece) AS rn
                 FROM lossed WHERE len(piece) > 1)
      SELECT l.piece, l.count, l.lp_micro, l.alt_micro,
             CAST(l.loss_micro AS BIGINT) AS loss_micro,
             (len(l.piece) = 1 OR r.rn <= (SELECT b FROM budget)) AS kept
      FROM lossed l LEFT JOIN ranked r ON r.piece = l.piece
      ORDER BY l.piece""",

    // q303: EVERY segmentation enumerated by a recursive CTE (lengths
    // 1..3 with piece-existence constraints), ranked by the engine's
    // total order (score desc, tokens asc, reversed-length-string desc =
    // longest final piece first), top-3 -- generated and verified against
    // an independent reference enumerator over all 500 ids.
    "q303_unigram_nbest" -> """
      WITH RECURSIVE base AS (
        SELECT doc_id,
               substr(c0||c1||c2||c3||c4||c5||c6||c7, 1, CAST(4 + doc_id % 5 AS INTEGER)) AS w
        FROM (SELECT doc_id,
                CASE WHEN (doc_id // 1) % 2 = 0 THEN 'a' ELSE 'b' END AS c0,
                CASE WHEN (doc_id // 2) % 2 = 0 THEN 'a' ELSE 'b' END AS c1,
                CASE WHEN (doc_id // 4) % 2 = 0 THEN 'a' ELSE 'b' END AS c2,
                CASE WHEN (doc_id // 8) % 2 = 0 THEN 'a' ELSE 'b' END AS c3,
                CASE WHEN (doc_id // 16) % 2 = 0 THEN 'a' ELSE 'b' END AS c4,
                CASE WHEN (doc_id // 32) % 2 = 0 THEN 'a' ELSE 'b' END AS c5,
                CASE WHEN (doc_id // 64) % 2 = 0 THEN 'a' ELSE 'b' END AS c6,
                CASE WHEN (doc_id // 128) % 2 = 0 THEN 'a' ELSE 'b' END AS c7
              FROM documents)),
      paths AS (
        SELECT doc_id, w, 0 AS pos, CAST(0 AS BIGINT) AS score, 0 AS tk, '' AS lenstr
        FROM base
        UNION ALL
        SELECT p.doc_id, p.w, p.pos + lens.l,
               p.score + CASE lens.l
                 WHEN 1 THEN CASE substr(p.w, p.pos + 1, 1)
                               WHEN 'a' THEN -3000000 WHEN 'b' THEN -3100000 END
                 WHEN 2 THEN CASE substr(p.w, p.pos + 1, 2)
                               WHEN 'ab' THEN -5500000 WHEN 'ba' THEN -5400000
                               WHEN 'aa' THEN -5900000 END
                 WHEN 3 THEN CASE substr(p.w, p.pos + 1, 3)
                               WHEN 'bab' THEN -8000000 WHEN 'aab' THEN -8100000 END
               END,
               p.tk + 1, p.lenstr || CAST(lens.l AS VARCHAR)
        FROM paths p, (VALUES (1), (2), (3)) AS lens(l)
        WHERE p.pos + lens.l <= len(p.w)
          AND CASE lens.l
                WHEN 1 THEN substr(p.w, p.pos + 1, 1) IN ('a', 'b')
                WHEN 2 THEN substr(p.w, p.pos + 1, 2) IN ('ab', 'ba', 'aa')
                WHEN 3 THEN substr(p.w, p.pos + 1, 3) IN ('bab', 'aab')
              END),
      done AS (SELECT doc_id, score, tk, reverse(lenstr) AS key
               FROM paths WHERE pos = len(w)),
      ranked AS (SELECT doc_id, score, tk,
                        row_number() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, tk, key DESC) AS rnk
                 FROM done)
      SELECT doc_id, CAST(rnk AS BIGINT) AS rank, CAST(score AS BIGINT) AS score_micro,
             CAST(tk AS BIGINT) AS n_tokens
      FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rank""",

    // q304: the same enumeration, picking the hash-chosen rank via the
    // shared md5 60-bit keyHash grid (salt 'aug1', modulo the capped
    // candidate count) -- the deterministic-augmentation contract.
    "q304_unigram_sampled" -> """
      WITH RECURSIVE base AS (
        SELECT doc_id,
               substr(c0||c1||c2||c3||c4||c5||c6||c7, 1, CAST(4 + doc_id % 5 AS INTEGER)) AS w
        FROM (SELECT doc_id,
                CASE WHEN (doc_id // 1) % 2 = 0 THEN 'a' ELSE 'b' END AS c0,
                CASE WHEN (doc_id // 2) % 2 = 0 THEN 'a' ELSE 'b' END AS c1,
                CASE WHEN (doc_id // 4) % 2 = 0 THEN 'a' ELSE 'b' END AS c2,
                CASE WHEN (doc_id // 8) % 2 = 0 THEN 'a' ELSE 'b' END AS c3,
                CASE WHEN (doc_id // 16) % 2 = 0 THEN 'a' ELSE 'b' END AS c4,
                CASE WHEN (doc_id // 32) % 2 = 0 THEN 'a' ELSE 'b' END AS c5,
                CASE WHEN (doc_id // 64) % 2 = 0 THEN 'a' ELSE 'b' END AS c6,
                CASE WHEN (doc_id // 128) % 2 = 0 THEN 'a' ELSE 'b' END AS c7
              FROM documents)),
      paths AS (
        SELECT doc_id, w, 0 AS pos, CAST(0 AS BIGINT) AS score, 0 AS tk, '' AS lenstr
        FROM base
        UNION ALL
        SELECT p.doc_id, p.w, p.pos + lens.l,
               p.score + CASE lens.l
                 WHEN 1 THEN CASE substr(p.w, p.pos + 1, 1)
                               WHEN 'a' THEN -3000000 WHEN 'b' THEN -3100000 END
                 WHEN 2 THEN CASE substr(p.w, p.pos + 1, 2)
                               WHEN 'ab' THEN -5500000 WHEN 'ba' THEN -5400000
                               WHEN 'aa' THEN -5900000 END
                 WHEN 3 THEN CASE substr(p.w, p.pos + 1, 3)
                               WHEN 'bab' THEN -8000000 WHEN 'aab' THEN -8100000 END
               END,
               p.tk + 1, p.lenstr || CAST(lens.l AS VARCHAR)
        FROM paths p, (VALUES (1), (2), (3)) AS lens(l)
        WHERE p.pos + lens.l <= len(p.w)
          AND CASE lens.l
                WHEN 1 THEN substr(p.w, p.pos + 1, 1) IN ('a', 'b')
                WHEN 2 THEN substr(p.w, p.pos + 1, 2) IN ('ab', 'ba', 'aa')
                WHEN 3 THEN substr(p.w, p.pos + 1, 3) IN ('bab', 'aab')
              END),
      done AS (SELECT doc_id, score, tk, reverse(lenstr) AS key
               FROM paths WHERE pos = len(w)),
      ranked AS (SELECT doc_id, score, tk,
                        row_number() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, tk, key DESC) AS rnk
                 FROM done),
      cnt AS (SELECT doc_id, least(3, count(*)) AS m FROM done GROUP BY doc_id),
      pick AS (SELECT r.doc_id, r.score, r.tk
               FROM ranked r
               JOIN cnt c ON c.doc_id = r.doc_id
               JOIN base b ON b.doc_id = r.doc_id
               WHERE r.rnk = (CAST(concat('0x', substring(md5('aug1' || b.w), 1, 15)) AS BIGINT) % c.m) + 1)
      SELECT doc_id, CAST(score AS BIGINT) AS score_micro, CAST(tk AS BIGINT) AS n_tokens
      FROM pick ORDER BY doc_id""",

    // q296: the seed-vocabulary substring explode re-derived: positions x
    // lengths <= 3, exact integer counts, (count desc, piece asc) top-40
    // with single chars forced in.
    "q296_unigram_seed" -> """
      WITH words AS (
        SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
          SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
          FROM documents)
        WHERE len(w) > 0 GROUP BY w),
      pos AS (SELECT w, wc, unnest(generate_series(1, len(w))) AS p FROM words),
      sub AS (SELECT substring(w, CAST(p AS INTEGER), CAST(l AS INTEGER)) AS piece, wc
              FROM (SELECT w, wc, p,
                      unnest(generate_series(1, least(3, len(w) - p + 1))) AS l
                    FROM pos)),
      counts AS (SELECT piece, CAST(sum(wc) AS BIGINT) AS piece_count FROM sub GROUP BY piece),
      top AS (SELECT piece, piece_count FROM counts
              ORDER BY piece_count DESC, piece LIMIT 40),
      chars AS (SELECT piece, piece_count FROM counts WHERE len(piece) = 1)
      SELECT piece, CAST(max(piece_count) AS BIGINT) AS piece_count
      FROM (SELECT * FROM top UNION ALL SELECT * FROM chars)
      GROUP BY piece ORDER BY piece""",
  )
}
