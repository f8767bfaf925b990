#!/usr/bin/env python3
"""One-shot splitter for queries/DataPipelinePack.scala (round-12 task 6).

Partitions the 8.7k-line pack into 7 thematic QueryPack objects plus a
PackShared helper object, preserving every entry block byte-for-byte.
Entry blocks are delimited by the `    "qNNN_..." ->` markers at map
indent; leading indent-4 comment runs travel with their entry. The script
asserts (a) reassembly of all blocks equals the original map regions,
(b) the theme map covers every key exactly once.
"""
import re, sys, collections

SRC = "src/main/scala/graft/queries/DataPipelinePack.scala"

PACKS = {
 "DedupPack": """q24_dedup_exact q25_dedup_near q30_fingerprint q32_dedup_simhash
   q39_ngram_jaccard q43_dedup_clusters q62_line_dedup q74_index_neardup
   q75_index_exact_dedup q83_index_lifecycle q85_dup_window_stats
   q86_strip_dup_windows q89_strip_vs_history q94_line_dedup_within
   q114_dedup_keep_best q118_url_dedup q119_simhash_idf q124_containment
   q147_incremental_cc q148_entity_resolution q168_er_canonical q194_ppjoin
   q196_dup_cluster_stats q204_winnowing q84_image_neardup q58_decontamination
   q122_semantic_decon q163_canary_audit q72_strip_lines""",
 "RetrievalPack": """q26_ann_topk q31_cosine_pairs q33_ann_lsh q40_ann_ivf
   q48_cosine_pairs_lsh q61_cosine_lsh_prod q81_ann_quantized q87_bm25_topk
   q88_semdedup q90_rrf_fusion q93_kmeans_train q96_semdedup_trained
   q97_rrf_dense q99_kmeans_farthest q106_jl_project q107_jl_ann
   q113_retrieval_eval q131_pq_train q132_pq_adc q145_ivfpq_adc q155_cross_ann
   q165_embedding_drift q166_lsh_occupancy q205_rbo q206_mmr
   q207_centroid_outliers q210_rm3_expansion q249_silhouette q254_tfidf_cosine
   q66_quantize_int8 q35_tfidf""",
 "TextPack": """q27_text_quality q28_lang_id q29_token_counts q56_chunking
   q57_pii_redaction q59_repetition q60_packing q65_top_ngrams q67_corpus_stats
   q68_edit_distance q92_quality_score q95_bigram_ppl q98_bigram_ppl_heldout
   q100_bpe_train q101_bpe_apply q102_gopher_rules q115_normalize q116_nb_train
   q117_nb_quality q121_span_corruption q123_bpe_card q135_c4_rules
   q137_trigram_langid q162_interpolated_ppl q164_template_mining
   q170_pmi_collocations q171_chi2_keywords q172_kl_divergence q173_script_mix
   q176_ngram_novelty q181_lexical_diversity q189_readability q199_langid_margin
   q212_jaro_winkler q247_heaps_law q149_zipf""",
 "CorpusPack": """q36_salted_agg q37_percentile q38_weighted_mean
   q41_multimodal_probe q45_salted_join q46_confluent_roundtrip
   q50_json_roundtrip q51_hash_sample q52_hash_split q53_stratified_sample
   q54_mix_corpora q63_url_metrics q64_domain_blocklist q69_range_join
   q70_interval_overlap q71_cap_per_key q73_token_budget q76_bucketed_join
   q79_resample_ffill q82_token_budget_by_group q91_temperature_mix
   q104_dsir_score q105_dsir_resample q108_kmv_distinct q109_kmv_overlap
   q110_hll_distinct q111_cms_freq q112_bloom_history q120_cluster_split
   q125_bottomk_sample q126_sample_quantiles q127_group_sample q133_zorder
   q134_weighted_sample q138_shuffle q139_rollup_merge q140_negative_sample
   q143_bloom_join q156_snapshot_diff q157_snapshot_apply q167_rolling_mau
   q175_epoch_mix q190_coordinated_sample q197_scd2_merge q213_weighted_sample
   q244_class_weights q234_privacy_audit q232_reconcile q200_id_gaps
   q158_fd_check q160_ri_check q152_expectations q201_grouping_id""",
 "StatsPack": """q128_table_profile q144_histogram q146_rolling_zscore
   q153_histogram_drift q159_entropy_card q174_hist_quantiles q177_median_mode
   q178_winsorize q183_ewma q184_cusum q185_mad_outliers q186_benford
   q187_trimmed_mean q195_corr q198_score_lift q203_reliability_card
   q208_cohen_kappa q209_profile_drift q211_decayed_counts q214_psi
   q215_mann_whitney q216_gini q217_ks_test q219_theil_sen
   q220_seasonal_baseline q221_krippendorff q222_auc q223_mutual_info q224_acf
   q225_bootstrap_ci q227_kaplan_meier q229_heavy_hitters q236_spearman
   q237_welch_ttest q238_anova q239_kendall_tau q240_ratio_jackknife
   q242_changepoint q243_stl q250_mann_kendall q255_brier q256_isotonic
   q257_calibrated_brier q258_oos_calibration q154_quantile_norm
   q180_rank_battery""",
 "ExperimentPack": """q230_ab_readout q233_cuped q235_permutation_test
   q245_matched_att q246_raking q248_experiment_scorecard q251_fdr_segments
   q252_qte q253_log_rank""",
 "GraphPack": """q103_pagerank q136_hits q169_triangles q179_degree_peel
   q191_ppr q202_link_authority_gate q218_label_prop q228_modularity
   q241_adamic_adar q141_funnel q142_cohort q161_journeys q182_attribution
   q188_funnel_lags q192_multitouch q193_markov q231_rfm q42_sessionize
   q226_event_ngrams""",
}

DOCS = {
 "DedupPack": "Deduplication & contamination: exact/near/line/SimHash/Jaccard/containment/winnowing dedup, connected components, ER, ppjoin, persisted dup-window indexes, decontamination and canary audits.",
 "RetrievalPack": "Similarity search & retrieval: brute/LSH/IVF/PQ/JL ANN, BM25, RRF, MMR/RBO/RM3 reranking, k-means, semdedup, embedding drift, TF-IDF cosine.",
 "TextPack": "Text analysis: quality scoring, language ID, tokenization/BPE, n-gram stats, perplexity, readability, PII, Gopher/C4 rules, collocations, keyword tests.",
 "CorpusPack": "Corpus operations: sampling/splitting/mixing, token budgets, sketches (KMV/HLL/CMS/Bloom), layout (z-order, bucketing), SCD2/snapshots, data-quality gates, serde round-trips, skew tooling.",
 "StatsPack": "Statistical profiling & inference: distribution/drift tests, classical inference, time-series decomposition, calibration (Brier/isotonic, in- and out-of-sample), agreement and association measures.",
 "ExperimentPack": "Experimentation: A/B readout with SRM guard, CUPED, permutation tests + FDR, matched-pairs ATT, raking, quantile treatment effects, log-rank, the composed scorecard.",
 "GraphPack": "Graph & behavioral analytics: PageRank/HITS/PPR, triangles, k-core, label propagation, modularity, link authority, funnels, cohorts, journeys, attribution, Markov chains, RFM, sessionization.",
}

theme = {}
for pack, keys in PACKS.items():
    for k in keys.split():
        assert k not in theme, f"dup theme assignment {k}"
        theme[k] = pack

lines = open(SRC).read().split("\n")

def find(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise AssertionError("not found")

q_open = find(lambda l: l.startswith("  def queries"))
q_close = find(lambda l: l == "  )", q_open)
o_open = find(lambda l: l.startswith("  def oracles"), q_close)
o_close = find(lambda l: l == "  )", o_open)
assert lines[o_close + 1] == "}" and o_close + 2 == len(lines) or lines[-1] == ""

header = lines[: find(lambda l: l.startswith("object DataPipelinePack"))]
imports = [l for l in header if l.startswith("import") or l.startswith("package")]
members = lines[q_close + 1 : o_open]

KEY_RE = re.compile(r'^    "(q[0-9][0-9a-z_]*)" ->')
COMMENT_RE = re.compile(r"^    //|^\s*$")

def split_entries(region):
    blocks, cur = [], None
    for line in region:
        m = KEY_RE.match(line)
        if m:
            head = []
            if cur is not None:
                # trailing comment/blank run belongs to THIS entry
                while cur and COMMENT_RE.match(cur[-1]):
                    head.insert(0, cur.pop())
                blocks.append(cur)
            else:
                pass
            cur = head + [line]
            cur_key = m.group(1)
            keys.append(cur_key)
        else:
            if cur is None:
                cur = []  # leading blanks before first entry
                keys.append(None)
            cur.append(line)
    blocks.append(cur)
    return blocks

keys = []
q_blocks = split_entries(lines[q_open + 1 : q_close])
q_keys = [k for k in keys if k]
keys = []
o_blocks = split_entries(lines[o_open + 1 : o_close])
o_keys = [k for k in keys if k]

# drop a possible leading no-key block of blanks
def normalize(blocks, keys_):
    if len(blocks) == len(keys_) + 1:
        assert all(not l.strip() for l in blocks[0]), blocks[0]
        blocks = blocks[1:]
    assert len(blocks) == len(keys_)
    return blocks

q_blocks = normalize(q_blocks, q_keys)
o_blocks = normalize(o_blocks, o_keys)

# sanity: reassembly is lossless
assert "\n".join(x for b in q_blocks for x in b).strip("\n") == "\n".join(
    lines[q_open + 1 : q_close]).strip("\n")
assert "\n".join(x for b in o_blocks for x in b).strip("\n") == "\n".join(
    lines[o_open + 1 : o_close]).strip("\n")

assert set(q_keys) == set(theme), (
    sorted(set(q_keys) ^ set(theme)))
assert set(o_keys) == set(theme), sorted(set(o_keys) ^ set(theme))

def with_comma(block):
    b = list(block)
    i = len(b) - 1
    while i >= 0 and not b[i].strip():
        i -= 1
    if not b[i].rstrip().endswith(","):
        b[i] = b[i] + ","
    return b

# ---- PackShared -------------------------------------------------------
shared = []
for l in members:
    l = re.sub(r"^  private def ", "  def ", l)
    l = re.sub(r"^  private val ", "  val ", l)
    l = re.sub(r"^  private lazy val ", "  lazy val ", l)
    l = re.sub(r"^  private\[graft\] (val|def) ", r"  \1 ", l)
    shared.append(l)
out = imports + ["",
  "/** Shared helpers for the thematic query packs (split from the former",
  "  * monolithic DataPipelinePack in round 12): oracle-SQL fragment",
  "  * builders, the DuckDB keyHash mirror, planted-fixture generators and",
  "  * the hashed quality-scorer weights. Package-private: only packs (and",
  "  * the graft.tools smoke harnesses) read these. */",
  "private[graft] object PackShared {"] + shared + ["}", ""]
open("src/main/scala/graft/queries/PackShared.scala", "w").write("\n".join(out))

# ---- packs ------------------------------------------------------------
for pack in PACKS:
    qb = [with_comma(b) for k, b in zip(q_keys, q_blocks) if theme[k] == pack]
    ob = [with_comma(b) for k, b in zip(o_keys, o_blocks) if theme[k] == pack]
    body = imports + ["", "import PackShared._", "",
      f"/** {DOCS[pack]}", "  *",
      "  * Conventions: every computed column aliased identically on both",
      "  * engines, deterministic ORDER BY, exact-decimal float sums — see",
      "  * [[QueryPack]]. */",
      f"object {pack} extends QueryPack {{", "",
      "  def queries: Map[String, (SparkSession, String) => DataFrame] = Map("]
    for b in qb:
        body += b
    body += ["  )", "", "  def oracles: Map[String, String] = Map("]
    for b in ob:
        body += b
    body += ["  )", "}", ""]
    open(f"src/main/scala/graft/queries/{pack}.scala", "w").write("\n".join(body))

import os
os.remove(SRC)
sizes = collections.Counter(theme.values())
print("entries:", dict(sizes), "total", sum(sizes.values()))
print("OK")
