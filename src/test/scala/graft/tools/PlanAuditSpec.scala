package graft.tools

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Regression gate over every SparkEntry query's physical plan: a new
  * CARTESIAN, BroadcastNestedLoopJoin, or derived-table broadcast cannot
  * land without an explicit allowlist entry here justifying why it is
  * bounded at 100 TB. The derived-broadcast class is the one that OOM'd the
  * LSH verify join at x16 scale (SURVEY §8.1 finding 1): Catalyst's static
  * size estimate for an explode→aggregate chain is the pre-explode scan
  * size, so AQE can neither see nor demote the mistake.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** (cartesian, bnlj, bcastDerived) ceilings per query, each with the
    * reason the flagged relation stays small at any corpus size. Absent =
    * (0, 0, 0). Raising a ceiling requires writing the new justification. */
  private val allow: Map[String, (Int, Int, Int)] = Map(
    // q26: probe set is a fixed literal list of query vectors (k probes,
    // parameter-bounded) broadcast against the corpus — BNLJ over a
    // constant-size side is the intended brute-force scoring shape.
    "q26_ann_topk" -> (0, 1, 0),
    // q31: THE documented exact all-pairs baseline; its bucketed sibling
    // q48 is hash-equal and is the scale path. Cartesian by design.
    "q31_cosine_pairs" -> (1, 1, 1),
    // q34: hot-key bucket table is derived but bounded by the bucket count
    // knob (<=256 rows) — deliberately replicated to break skew.
    "q34_asof_bucketed" -> (0, 0, 1),
    // q35: corpus-count scalar (1 row) crossJoined for N, plus the
    // vocabulary-sized document-frequency table explicitly broadcast —
    // vocabulary grows sublinearly and stays dimension-like at 100 TB.
    "q35_tfidf" -> (0, 1, 2),
    // q37: percentile boundary table (one row per requested percentile).
    "q37_percentile" -> (0, 0, 1),
    // q40: trained IVF quantizer centroids (nlist rows, a model parameter).
    "q40_ann_ivf" -> (0, 0, 1),
    // q45: salt replication table (salt-factor rows, a knob).
    "q45_salted_join" -> (0, 0, 1),
    // q58: benchmark n-gram set — eval corpora are small by nature; the
    // documented escape hatch (broadcastBench=false) covers the exception.
    "q58_decontamination" -> (0, 0, 2),
    // q60: two-phase distributed prefix sum — per-bucket offset tables
    // (`buckets` rows, a knob) broadcast back; BNLJ against scalar bounds.
    "q60_packing" -> (0, 2, 3),
    // q306: the same packSequences prefix-sum shape as q60 (scalar maxDoc
    // bound + buckets-row offset table broadcast back).
    "q306_sampled_packing" -> (0, 2, 3),
    // q61: recall summary assembles four ONE-ROW count aggregates via
    // scalar crossJoins; the corpus-sized paths (candidates, verify,
    // truth semi-probe) are all SMJ-pinned inside the operator/query.
    "q61_cosine_lsh_prod" -> (0, 3, 3),
    // q64: the deliberately-broadcast domain blocklist's distinct()
    // (blocklists are domain-count sized by nature, like q58's benchmark
    // set); the corpus-bounded matched-id set is SMJ-pinned in the operator.
    "q64_domain_blocklist" -> (0, 0, 1),
    // q73: the two-phase prefix sum's offset table (|groups|·256 rows,
    // bounded by the enum-sized group cardinality and the bucket knob)
    // broadcast back — q60's pack-offset class.
    "q73_token_budget" -> (0, 0, 1),
    // q81: q26's brute-force shape over the dequantized vectors — the
    // probe set is parameter-bounded and broadcast by design.
    "q81_ann_quantized" -> (0, 1, 0),
    // q317: q26's brute-force probe class over the packed sign codes —
    // the probe set (vec_id < 10) is parameter-bounded and broadcast by
    // design; the corpus side is one scan.
    "q317_hamming_topk" -> (0, 1, 0),
    // q327: q31's documented all-pairs class — screen-fidelity
    // measurement is exhaustive BY DEFINITION at eval scale (the
    // production screen itself is q316's banded equi-join).
    "q327_sign_fidelity" -> (1, 1, 1),
    // q330: q26's probe class (vec_id < 10, parameter-bounded, broadcast
    // by design); the near-dup exclusion set is SMJ-pinned inside the
    // operator.
    "q330_hard_negatives" -> (0, 1, 0),
    // q82: q73's offset-table broadcast, same bounded class.
    "q82_token_budget_by_group" -> (0, 0, 1),
    // q84: centerForBuckets' 1-row mean aggregate crossJoined back into the
    // bucketing projection — a scalar by construction (q35's N class).
    "q84_image_neardup" -> (0, 1, 1),
    // q87: four bounded broadcasts — the literal query table (parameter-
    // sized), the query-term set semi-joined into the document-frequency
    // derivation (so df is computed and broadcast for query terms ONLY,
    // never the full vocabulary), the resulting query-bounded df table,
    // and the 1-row N/avgdl corpus aggregate (whose crossJoin is the
    // BNLJ, q35's class). The corpus-sized tf path is a hash join; top-k
    // emits straight from the bounded aggregator, so the scored subtree
    // plans exactly once.
    "q87_bm25_topk" -> (0, 1, 4),
    // q90: two BM25 legs, each carrying q87's bounded quad exactly once.
    "q90_rrf_fusion" -> (0, 2, 8),
    // q91: the group-count/power-sum scalars — an enum-sized rate table and
    // a 1-row totals aggregate (its crossJoin is the BNLJ), both broadcast
    // back by construction (q35's N class).
    "q91_temperature_mix" -> (0, 1, 2),
    // q93: the final size join broadcasts the k-row (k = 4, a model
    // parameter) trained-centroid table — the quantizer class (q40).
    "q93_kmeans_train" -> (0, 0, 1),
    // q95: the 1-row vocabulary-size scalar (its crossJoin is the BNLJ —
    // q35's N class). The corpus-shaped bigram/history count tables are
    // SMJ-pinned joins, never broadcast.
    "q95_bigram_ppl" -> (0, 1, 1),
    // q97: q90's two BM25 legs (each q87's bounded quad) plus the dense
    // leg's probe broadcast — a 2-row parameter-sized probe set crossJoined
    // against the corpus, q26's intended brute-force scoring shape.
    "q97_rrf_dense" -> (0, 3, 8),
    // q98: q95's 1-row vocabulary scalar, trained on the even-doc half.
    "q98_bigram_ppl_heldout" -> (0, 1, 1),
    // q99: q93's k-row trained-centroid size join (k = 4, a model
    // parameter); the farthest-point selection jobs run eagerly at build
    // time and never appear in the returned plan.
    "q99_kmeans_farthest" -> (0, 0, 1),
    // q137: the |langs|-row language list crossJoined into the doc-gram
    // frame (enum-sized — its broadcast is the BNLJ) and the two
    // model-sized broadcasts (the |langs|·topN profile, the lang list).
    "q137_trigram_langid" -> (0, 1, 2),
    // q138: the two-phase prefix sum's 256-row bucket-offset table
    // broadcast back (q60/q73's pack-offset class).
    "q138_shuffle" -> (0, 0, 1),
    // q140: q138's offset table inside the position map, plus the 1-row
    // corpus-count scalar (its crossJoin is the BNLJ — q35's N class).
    // The corpus-shaped draws⋈positions match is SMJ-pinned both sides.
    "q140_negative_sample" -> (0, 1, 2),
    // q331: q162's class, doubled — the totals frame is TWO 1-row
    // scalars (bigram-type count x distinct-unigram count) crossJoined
    // together, then broadcast into the scored-bigram join: 2 BNLJ +
    // 2 derived broadcasts, every flagged relation exactly one row.
    "q331_kneser_ney_ppl" -> (0, 2, 2),
    // q332: the same two-scalar totals class at order 3.
    "q332_kn_trigram_ppl" -> (0, 2, 2),
    // q162: q95/q98's 1-row T/V scalar (its crossJoin is the BNLJ); the
    // vocabulary-shaped count tables (c12, c1, unigram) are SMJ-pinned.
    "q162_interpolated_ppl" -> (0, 1, 1),
    // q165: two 1-row mean-vector aggregates crossJoined (q35's scalar
    // class — the BNLJ and its broadcast).
    "q165_embedding_drift" -> (0, 1, 1),
    // q154: the grouped-rank prefix sum's |groups|·2^bits offset table
    // (q60/q73's class) plus the enum-sized per-source count table, both
    // broadcast by construction.
    "q154_quantile_norm" -> (0, 0, 2),
    // q153: the 1-row histogram-total scalar crossJoined back into the
    // bins-sized TV sum (q35's N class — the BNLJ and its broadcast).
    "q153_histogram_drift" -> (0, 1, 1),
    // q145: the probe-side cell fan-out (parameter-sized: probes × nprobe
    // rows carrying the LUTs) broadcast into the code-table join by design
    // — q132's probe class, keyed on cell instead of a crossJoin.
    "q145_ivfpq_adc" -> (0, 0, 1),
    // q132: ADC scoring — the probe side (parameter-sized, carrying the
    // m·ksub lookup table) is broadcast-crossJoined against the code table
    // by design (q26/q81's probe class); the codebooks themselves are
    // literals, never a join side.
    "q132_pq_adc" -> (0, 1, 0),
    // q107: q26's brute-force scoring shape over the JL-projected vectors —
    // the 5-row parameter-sized probe set broadcast-crossJoined against the
    // corpus by design (q81's class).
    "q107_jl_ann" -> (0, 1, 0),
    // q103: PageRank's 1/N node-count scalar — a 1-row count aggregate
    // crossJoined into the init projection and into each of the 2
    // iterations' rank updates (q35's N class, 3 scalar crossJoins total).
    // The graph-shaped tables (nodes, outdeg, edges, contribs) are all
    // SMJ-pinned keyed joins, never broadcast.
    "q103_pagerank" -> (0, 3, 3),
    // q109: each side's KMV sketch is ONE row (an array of <= k longs) by
    // construction — the whole point of the operator is that overlap is
    // computed from the two sketches alone; their crossJoin is the BNLJ
    // and the derived broadcast (q35's scalar class, never corpus-shaped).
    "q109_kmv_overlap" -> (0, 1, 1),
    // q111: two bounded-by-construction broadcasts — the CMS counter table
    // (<= depth*width = 2048 rows, a FIXED size regardless of corpus) into
    // the probe lookup join, and the top-8 probe set into its exact-count
    // re-join. The element stream feeding both aggregations stays a hash
    // shuffle.
    "q111_cms_freq" -> (0, 0, 2),
    // q112: the Bloom bitmap table is <= mBits/32 rows by CONSTRUCTION
    // (128 at the q112 sizing) no matter how large history grows —
    // broadcasting it into the probe's left join is the operator's whole
    // point (the probe side, corpus-shaped, stays unshuffled until its own
    // k-row-per-probe reduction).
    "q112_bloom_history" -> (0, 0, 1),
    // q122: the benchmark eval-embedding set broadcast-crossJoined against
    // the corpus scan (q26's intended probe shape; eval sets are
    // benchmark-sized by nature, q58's argument). The corpus-bounded
    // matched-id set is SMJ-pinned in the operator (q64's discipline).
    "q122_semantic_decon" -> (0, 1, 0),
    // q128: the profiler's final |cols|-row join (per-column basic stats
    // with the per-column HLL estimates — both sides bounded by the
    // PARAMETER column list, never by the corpus; the corpus-shaped
    // unpivot stream collapses in the two keyed aggregations above it).
    "q128_table_profile" -> (0, 0, 1),
    // q116: the NB trainer's two bounded-by-construction broadcasts — the
    // per-bucket count table (<= buckets = 64 rows, a model parameter,
    // regardless of corpus size) into the domain join, and the 1-row
    // class-totals aggregate whose crossJoin is the BNLJ (q35's N class).
    // The corpus-shaped token stream collapses in the ONE keyed counting
    // aggregation before anything is broadcast.
    "q116_nb_train" -> (0, 1, 2),
    // q119: the 1-row corpus-count scalar for the idf weight (its
    // crossJoin is the BNLJ — q35's N class). The corpus-shaped df-count
    // join back to token occurrences is SMJ-pinned in the operator.
    "q119_simhash_idf" -> (0, 1, 1),
    // q113: q87's bounded BM25 quad (1 scalar BNLJ + its parameter-sized
    // broadcasts) plus the qrels derivation — a 3-row query-term table
    // crossJoined against the corpus (q26's intended probe shape), planned
    // twice because qrels feeds both the hit join and the ideal-DCG
    // aggregate. Every broadcast is query-count- or scalar-sized.
    "q113_retrieval_eval" -> (0, 3, 5),
    // q170: the two 1-row totals scalars (token count N, bigram count B) —
    // q35's N class; their crossJoins are the two BNLJs. The
    // vocabulary-shaped unigram/bigram count tables are SMJ-pinned.
    "q170_pmi_collocations" -> (0, 2, 2),
    // q171: the |groups|-row group-marginal table (enum-sized — langs) and
    // the 1-row grand-total scalar (its crossJoin is the BNLJ, q35's N
    // class), both broadcast by construction. The vocabulary-shaped
    // term-marginal join is SMJ-pinned.
    "q171_chi2_keywords" -> (0, 1, 2),
    // q172: the |slices|-row slice-totals table (enum-sized — sources) and
    // the 1-row corpus T/V scalar (its crossJoin is the BNLJ). The
    // vocabulary-shaped term-marginal join is SMJ-pinned.
    "q172_kl_divergence" -> (0, 1, 2),
    // q174: the quantile list (3 literal rows, a parameter) exploded from
    // a 1-row range and crossJoined into the bins-sized cumulative frame —
    // q37's percentile-boundary class (the BNLJ and its broadcast).
    "q174_hist_quantiles" -> (0, 1, 1),
    // q177: the 3-row per-flag median/mode aggregates joined — both sides
    // enum-sized by the grouping key (flags), never corpus-shaped.
    "q177_median_mode" -> (0, 0, 1),
    // q178: the |langs|-row percentile-bounds table broadcast back — the
    // q37 boundary-table class, explicitly requested in the operator.
    "q178_winsorize" -> (0, 0, 1),
    // q185: the enum-sized per-type median table (broadcast into BOTH the
    // MAD derivation and the scoring join — two plan references) plus the
    // enum-sized MAD table; all |event_types| rows, the q37 class.
    "q185_mad_outliers" -> (0, 0, 3),
    // q186: the 1-row digit-total scalar (its crossJoin is the BNLJ —
    // q35's N class); the digit table itself is 9 rows.
    "q186_benford" -> (0, 1, 1),
    // q187: the |langs|-row percentile-bounds broadcast — q178's class.
    "q187_trimmed_mean" -> (0, 0, 1),
    // q193: the |event_types|-row from-type totals table (enum-sized)
    // broadcast into the probability projection — the q37 class.
    "q193_markov" -> (0, 0, 1),
    // q198: three bounded scalar/boundary tables crossJoined back (the
    // BNLJs and their broadcasts) — the 1-row decile-threshold aggregate
    // (q37's class), the 1-row corpus totals (q35's N class), and the
    // NB prior's 1-row aggregate inside the trained-scorer composition.
    "q198_score_lift" -> (0, 3, 3),
    // q199: q137's allowance — the |langs|-row language list crossJoined
    // (its broadcast is the BNLJ) plus the two model-sized broadcasts.
    "q199_langid_margin" -> (0, 1, 2),
    // q205: two parameter-sized probe sets (5 rows each — raw and
    // quantized) broadcast-crossJoined against the corpus by design
    // (q26/q81's intended brute-force scoring shape, once per run).
    "q205_rbo" -> (0, 2, 0),
    // q207: the |groups|-row integer-grid centroid table broadcast back
    // into the scoring projection — the q37/q40 model-table class (its
    // subtree contains the grouping aggregate, hence derived).
    "q207_centroid_outliers" -> (0, 0, 1),
    // q208: the two per-class marginal tables (|groups|·|classes| rows —
    // both enum-sized by the rater-label contract) broadcast into the
    // chance-agreement join — the q171 group-marginal class.
    "q208_cohen_kappa" -> (0, 0, 2),
    // q209: the two |cols|-row profile frames (parameter-bounded by the
    // column lists) joined for the drift diff — q128's profiler class.
    "q209_profile_drift" -> (0, 0, 2),
    // q211: the 1-row max-event-time anchor crossJoined back (q35's N
    // class — the BNLJ and its broadcast).
    "q211_decayed_counts" -> (0, 1, 1),
    // q213: the k-row A-ES winner set (TopKScored output, parameter-
    // bounded) broadcast back for the weight join — the q40 model-table
    // class.
    "q213_weighted_sample" -> (0, 0, 1),
    // q214: the 1-row histogram-totals scalar crossJoined into the
    // bins-sized smoothing projection (q153's exact class).
    "q214_psi" -> (0, 1, 1),
    // q263: the streaming drain of q214 — the same shared
    // psiFromBinCounts finishing, so the same 1-row totals crossJoin.
    "q263_streaming_drift" -> (0, 1, 1),
    // q217: the 1-row (n_a, n_b) totals scalar crossJoined into the
    // value-grid cumulative frame (q35's N class — the BNLJ and its
    // broadcast). The value grid itself collapses in its own aggregation.
    "q217_ks_test" -> (0, 1, 1),
    // q220: two 1-row distinct-day scalars (pre / post observation spans)
    // crossJoined into the |keys|·24-slot rate frame — q35's N class ×2.
    "q220_seasonal_baseline" -> (0, 2, 2),
    // q221: the 1-row totals scalar crossJoined into the coincidence
    // frame; the value-marginal table is |distinct labels|-sized (rater
    // scales are enum-bounded by contract) — q171's marginal class.
    "q221_krippendorff" -> (0, 1, 1),
    // q223: the contingency assembly — the 1-row grand-total scalar
    // crossJoined into the cell grid and BOTH marginal entropy grids, and
    // the final 1-row assembly crossJoining four 1-row aggregates
    // (cell-sum, H_x, H_y, cardinalities). Every flagged side is 1 row or
    // |card_x × card_y| (categorical-enum bounded by contract); the
    // corpus stream collapses in the FIRST keyed aggregation.
    "q223_mutual_info" -> (0, 8, 8),
    // q225: the 1-row CI-bounds aggregate crossJoined back onto the 1-row
    // point estimate (q35's scalar class).
    "q225_bootstrap_ci" -> (0, 1, 1),
    // q227: the 1-row cohort-total scalar crossJoined into the
    // |distinct durations|-sized life table (q35's N class).
    "q227_kaplan_meier" -> (0, 1, 1),
    // q228: the two 1-row aggregates (intra-community edge count,
    // degree-mass sum) crossJoined onto the 1-row edge total — all
    // scalar by construction (q35's class ×2).
    "q228_modularity" -> (0, 2, 2),
    // q231: the 1-row RFM quintile-cuts aggregate (three 4-element
    // percentile arrays) broadcast back into the per-user scoring
    // projection — q37's boundary-table class (the max-date anchor's
    // crossJoin is absorbed by the localCheckpoint leaf).
    "q231_rfm" -> (0, 1, 1),
    // q235: three scalar crossJoins — the checkpointed 1-row observed
    // aggregate into the permutation fan-out and twice into the final
    // assembly (q103's repeated-scalar class); the only derived broadcast
    // is the 1-row permutation p-value summary.
    "q235_permutation_test" -> (0, 3, 1),
    // q243: the |keys|·period seasonal table (enum-sized by the grouping
    // key and the period knob) explicitly broadcast back into the
    // decomposition projection — the q37 boundary-table class.
    "q243_stl" -> (0, 0, 1),
    // q244: the 1-row (k, N, Σraw) totals aggregate crossJoined back into
    // the k-row class frame (q35's N class — the BNLJ and its broadcast).
    "q244_class_weights" -> (0, 1, 1),
    // q247: the id bounds are now collected driver-side (overflow-checked
    // literals), so the only flagged relation is the buckets-row
    // first-bucket frame broadcast into the cumulative join — knob-sized.
    // The token stream is still DELIBERATELY scanned twice (bucket totals
    // + per-token first bucket): re-reading the corpus beats materializing
    // a token-stream-shaped intermediate.
    "q247_heaps_law" -> (0, 0, 1),
    // q248: the composed experiment page — q235's three scalar crossJoins
    // (the checkpointed observed aggregate ×2 + the permutation summary)
    // plus the scorecard's own two 1-row-leg crossJoins; every flagged
    // side is a single-row aggregate (q35's scalar class).
    "q248_experiment_scorecard" -> (0, 5, 3),
    // q253: two 1-row scalar crossJoins — the checkpointed (n_a, n_b,
    // events) totals into the duration-grid risk frame, and the 1-row
    // term-sums aggregate (the one derived broadcast) into the final
    // readout (q35's N class ×2).
    "q253_log_rank" -> (0, 2, 1),
    // q255: two 1-row scalar crossJoins — the global totals (derived off
    // the checkpointed bins frame) into the bins-sized term projection,
    // and the 1-row term sums back into the final readout (q35's N
    // class ×2; both broadcast sides are bins-derived 1-row aggregates).
    "q255_brier" -> (0, 2, 2),
    // q256: the PAV minimax's two range joins (j ≤ k, then j ≤ i ≤ k) are
    // BNLJs BY CONSTRUCTION over the checkpointed bins frame — both sides
    // bounded by the bins KNOB (≤ 256, enforced), so the B³ enumeration
    // is at most ~16M cheap rows regardless of corpus size.
    "q256_isotonic" -> (0, 2, 0),
    // q257: the composed calibration loop — q255's two scalar crossJoins,
    // q256's two knob-bounded PAV range-join BNLJs, and the final 1-row
    // calibrated-leg crossJoin; every flagged side is a 1-row aggregate
    // or the ≤256-bin frame (the q35 scalar / q256 knob classes).
    "q257_calibrated_brier" -> (0, 5, 4),
    // q258: q256's two knob-bounded PAV range-join BNLJs (fit on the
    // train half) plus the final 1-row n_train scalar crossJoin — the
    // one derived broadcast (q35's N class); everything else is the
    // single (is_train, bin) corpus aggregation and bins-sized SMJs.
    "q258_oos_calibration" -> (0, 3, 1),
    // q281: the final readout crossJoins four 1-row aggregates (items,
    // decided pairs, decided triads, circular triads) — three scalar
    // crossJoins and their 1-row broadcasts, q228's modularity class.
    // The corpus-shaped duel stream collapses in the eagerly
    // checkpointed pair-count aggregation inside the operator; the
    // triad/cycle joins ride the items-bounded majority digraph as SMJs.
    "q281_transitivity" -> (0, 3, 3)
  )

  test("no query plans an unjustified cartesian / BNLJ / derived broadcast, and none a ScalaUDF") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val a = PlanAudit.audit(q(spark, sfDir))
      val (c, b, d) = allow.getOrElse(name, (0, 0, 0))
      if (a.cartesian > c || a.bnlj > b || a.bcastDerived > d || a.scalaUdf > 0)
        Some(s"$name ${a.render} exceeds allowance (cartesian<=$c bnlj<=$b bcastDerived<=$d scalaUdf=0)")
      else None
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
