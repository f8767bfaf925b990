package graft.queries
import graft.Tables
import graft.operators.{AsofJoin, Chunking, Dedup, Multimodal, Profiler, RangeJoin, Rollup, Sampling, Similarity, Sketches, Skew, TextAnalysis, TimeSeries, Tokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import PackShared._

/** Statistical profiling & inference: distribution/drift tests, classical inference, time-series decomposition, calibration (Brier/isotonic, in- and out-of-sample), agreement and association measures.
  *
  * Conventions: every computed column aliased identically on both
  * engines, deterministic ORDER BY, exact-decimal float sums — see
  * [[QueryPack]]. */
object StatsPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Table profile: the per-column data-quality card — row/null counts,
    // lexicographic min/max of the string form, and the register-exact HLL
    // distinct estimate (p=6), all keyed by column name through one
    // unpivot scan. The oracle rebuilds every HLL register per column.
    "q128_table_profile" -> ((s, d) => {
      Profiler.profileColumns(Tables.documents(s, d),
        Seq("doc_id", "lang", "source", "n_chars"), p = 6, salt = "prof9")
        .orderBy(col("column"))
    }),

    // Column-entropy card over the enum columns: concentration in nats,
    // exact counts under the fold, ln rounds at 6.
    "q159_entropy_card" -> ((s, d) => {
      Profiler.entropyCard(Tables.documents(s, d), Seq("lang", "source"))
        .orderBy(col("column"))
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

    // Vintage drift: total-variation distance between the even- and
    // odd-doc n_chars distributions over the shared q144 bin domain —
    // exact integer-count ratios, one number out.
    "q153_histogram_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Profiler.histogramDrift(
        docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1),
        "n_chars", minV = 0L, maxV = 4095L, bins = 16)
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

    // q203's CONTINUOUS form driven for real: the same scored frame
    // staged to a 3-file directory, drained by an actual readStream
    // (maxFilesPerTrigger=1 → ≥3 micro-batches) through the
    // O(bins)-per-shard streaming calibration fold, snapshots merged by
    // max-epoch + per-bin long sums — the card must be BIT-IDENTICAL to
    // q203's batch SQL oracle, which is the whole drain≡batch contract
    // on the integer score grid.
    "q262_streaming_calibration" -> ((s, d) => {
      import s.implicits._
      val scored = TextAnalysis.hashedLinearScore(
        Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang")),
        "doc_id", "text", qualityWeights, bias = -0.5)
      val staged = scored.select(
        pmod(col("doc_id"), lit(4)).cast("int").as("_1"),
        col("doc_id").cast("long").as("_2"),
        col("quality_score").cast("double").as("_3"),
        (col("lang") === "en").as("_4"))
      val snapshots = PackShared.drainStaged(s, staged, "q262_sink", "q262-scores")(
        in => graft.streaming.StreamingCalibration
          .binCounts(in.as[(Int, Long, Double, Boolean)], bins = 10)
          .toDF("shard", "epoch", "bin", "n", "s7", "pos"))
      graft.streaming.StreamingCalibration.card(snapshots)
        .orderBy(col("bin"))
    }),

    // Data-contract battery: the expectation-suite gate a landing zone
    // runs before admitting a vintage — bounds on ranges, null fractions
    // and cardinalities, observed values reported next to each bound.
    // One scalar aggregation + exact distinct counts (audit contract).
    "q266_expectations" -> ((s, d) => {
      graft.operators.Profiler.expectationReport(Tables.documents(s, d), Seq(
        ("doc_id", "distinct_ge", 100.0),
        ("text", "null_frac_le", 0.0),
        ("n_chars", "min_ge", 0.0),
        ("n_chars", "max_le", 100000.0),
        ("lang", "distinct_le", 16.0),
        ("source", "distinct_le", 64.0)))
        .orderBy(col("col_name"), col("kind"))
    }),

    // q266's CONTINUOUS form for the O(1)-statistic kinds: event values
    // (with a deterministic null injection — 'error' events carry no
    // value) drained through the per-shard (n, nulls, min, max) fold;
    // the report must be BIT-IDENTICAL to the batch battery over the
    // same rows, including a FAILING max_le rule (the planted breach).
    "q267_streaming_contract" -> ((s, d) => {
      import s.implicits._
      val staged = Tables.events(s, d).select(
        pmod(col("event_id"), lit(4)).cast("int").as("_1"),
        col("event_id").cast("long").as("_2"),
        when(col("event_type") === "error", lit(null))
          .otherwise(col("value")).cast("double").as("_3"))
      val snaps = PackShared.drainStaged(s, staged, "q267_sink", "q267-values")(
        in => graft.streaming.StreamingExpectations
          .stats(in.as[(Int, Long, Option[Double])])
          .toDF("shard", "epoch", "n", "nulls", "min", "max"))
      graft.streaming.StreamingExpectations.report(snaps, "value", Seq(
        ("min_ge", 0.0), ("max_le", 100.0), ("null_frac_le", 0.25)))
        .orderBy(col("kind"))
    }),

    // The distinct_* kinds q266/q267 defer to the sketch family, drained
    // for real: per-shard KMV sketches (O(k) state forever) over doc_id
    // hashes, merged by the batch aggregator's own distinct-merge-keep-k,
    // estimated through the batch kmvDistinct expression on the 1e-6
    // grid, evaluated as contract rules with the estimate-mode flag. The
    // oracle re-derives the estimator from the same md5 hash literals —
    // a drifted hash, merge, or estimator constant fails the hash gate.
    "q275_streaming_distinct" -> ((s, d) => {
      import s.implicits._
      val staged = Tables.documents(s, d).select(
        pmod(col("doc_id"), lit(4)).cast("int").as("_1"),
        col("doc_id").cast("long").as("_2"),
        graft.operators.Sampling.keyHash(col("doc_id"), "card1").as("_3"))
      val snaps = PackShared.drainStaged(s, staged, "q275_sink", "q275-docs")(
        in => graft.streaming.StreamingCardinality
          .kmvSketches(in.as[(Int, Long, Long)], k = 64)
          .toDF("shard", "epoch", "kmv"))
      graft.streaming.StreamingCardinality.distinctReport(snaps, "doc_id",
        Seq(("distinct_ge", 100.0), ("distinct_le", 1000000.0)), k = 64)
        .orderBy(col("kind"))
    }),

    // Sliding event-time windows (the q21 tumbling sibling): every event
    // lands in windowLength/slide = 4 hourly windows at 15-min offsets.
    // The oracle expands each event into its 4 epoch-aligned window
    // starts — a drifted alignment, span, or off-by-one-window fails the
    // hash gate. (Batch execution of the same streaming-shape operator;
    // the watermark is a no-op on batch.)
    "q287_sliding_window" -> ((s, d) =>
      graft.streaming.Streams.slidingCounts(
          Tables.events(s, d).filter(col("ts").isNotNull),
          "ts", windowLength = "1 hour", slide = "15 minutes",
          watermarkDelay = "1 minute", col("event_type"))
        .orderBy(col("bucket"), col("event_type"))),

    // Tumbling event-time counts (the operator q287's sliding form
    // generalizes; previously spec-only): hourly epoch-aligned buckets
    // per event type, batch execution of the same streaming-shape
    // operator (watermark no-op on batch). Oracle: each event's single
    // epoch-aligned window start.
    "q309_tumbling_counts" -> ((s, d) =>
      graft.streaming.Streams.tumblingCounts(
          Tables.events(s, d).filter(col("ts").isNotNull),
          "ts", windowLength = "1 hour",
          watermarkDelay = "1 minute", col("event_type"))
        .orderBy(col("bucket"), col("event_type"))),

    // q287's operator driven through a REAL readStream drain (4 micro-
    // batches): append-mode windowed aggregation only emits a window
    // once the watermark passes its end, so a far-future sentinel event
    // (guaranteed-last file via drainStagedLast's mtime bump) flushes
    // every real window, and the full-span watermark delay keeps the
    // unordered staged files from dropping anything as late. Gated
    // against q287's exact oracle: micro-batch boundaries must not
    // change window assignment.
    "q298_sliding_drain" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("ts").isNotNull)
        .select(col("ts"), col("event_type"))
      // 1-row scalar collect (the justified class): the sentinel must
      // clear every real window end under the full-span delay
      val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
      val sentinelTs = java.sql.Timestamp.from(
        maxTs.toInstant.plus(java.time.Duration.ofDays(3651)))
      val sentinel = s.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(sentinelTs, "__sentinel")), ev.schema)
      PackShared.drainStagedLast(s, ev, sentinel, "q298_sink", "q298-events")(
          in => graft.streaming.Streams.slidingCounts(
            in, "ts", windowLength = "1 hour", slide = "15 minutes",
            watermarkDelay = "3650 days", col("event_type")))
        .filter(col("event_type") =!= "__sentinel")
        .orderBy(col("bucket"), col("event_type"))
    }),

    // Session-window counts (the count-only sibling of q42's full
    // session aggregate, closing the last audit-flagged public def):
    // same native session_window operator batch-mode, 3-hour gap,
    // gaps-and-islands oracle.
    "q293_session_counts" -> ((s, d) =>
      graft.streaming.Streams.sessionCounts(
          Tables.events(s, d).filter(col("ts").isNotNull), "ts",
          gap = "3 hours", watermarkDelay = "1 minute", col("user_id"))
        .orderBy(col("user_id"), col("session_start"))),

    // q293's operator driven through a REAL readStream drain — a sharper
    // test of the sentinel-flush pattern than q298's fixed sliding grid,
    // because session windows MERGE in state as unordered micro-batches
    // land (an early event can fuse two open sessions); the final merged
    // sessions must still equal the batch gaps-and-islands oracle. Same
    // full-span watermark delay + guaranteed-last far-future sentinel
    // (user -1, filtered from the output).
    "q300_session_drain" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("ts").isNotNull)
        .select(col("ts"), col("user_id"))
      val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
      val sentinelTs = java.sql.Timestamp.from(
        maxTs.toInstant.plus(java.time.Duration.ofDays(3651)))
      val sentinel = s.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(sentinelTs, -1L)), ev.schema)
      PackShared.drainStagedLast(s, ev, sentinel, "q300_sink", "q300-events")(
          in => graft.streaming.Streams.sessionCounts(
            in, "ts", gap = "3 hours", watermarkDelay = "3650 days",
            col("user_id")))
        .filter(col("user_id") =!= -1L)
        .orderBy(col("user_id"), col("session_start"))
    }),

    // Hill tail index of document lengths: the heavy-tail exponent that
    // decides whether mean-based curation budgets are even meaningful
    // (α ≤ 1: no mean; α ≤ 2: no variance). One k-bounded TakeOrdered +
    // a scalar aggregation — never a global sort.
    "q269_hill_tail" -> ((s, d) => {
      graft.operators.Profiler.hillTailIndex(
        Tables.documents(s, d).select(col("n_chars")), "n_chars", k = 200)
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

    // Time-decayed event counts per type (half-life 7 days, anchored at
    // the corpus's max event time): the trending score — recency-weighted
    // volume on the 1e-9 integer grid.
    "q211_decayed_counts" -> ((s, d) => {
      TimeSeries.decayedCounts(Tables.events(s, d), "event_type", "ts",
        halfLifeSecs = 7.0 * 86400.0)
        .orderBy(col("event_type"))
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

    // q214's CONTINUOUS form driven for real: the reference vintage's
    // histogram built batch (bins-bounded, once), the live vintage staged
    // to a 3-file directory and drained by an actual readStream
    // (maxFilesPerTrigger=1 → ≥3 micro-batches) through the
    // O(bins)-per-shard streaming histogram fold, snapshots merged by
    // max-epoch + per-bin long sums — the PSI must be BIT-IDENTICAL to
    // q214's batch SQL oracle, the drain≡batch contract on the zBucket
    // integer grid.
    "q263_streaming_drift" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val staged = docs.filter(col("doc_id") % 2 =!= 0).select(
        pmod(col("doc_id"), lit(4)).cast("int").as("_1"),
        col("doc_id").cast("long").as("_2"),
        (col("n_chars") * 2).cast("long").as("_3"))
      val snapshots = PackShared.drainStaged(s, staged, "q263_sink", "q263-live")(
        in => graft.streaming.StreamingDrift
          .binCounts(in.as[(Int, Long, Long)], minV = 0L, maxV = 2047L, bins = 32)
          .toDF("shard", "epoch", "bin", "cnt"))
      graft.streaming.StreamingDrift.psiVsReference(snapshots,
        graft.operators.Profiler.histogram(
          docs.filter(col("doc_id") % 2 === 0).select(col("n_chars")),
          "n_chars", Seq.empty, minV = 0L, maxV = 2047L, bins = 32),
        bins = 32)
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

    // Two-pass heavy hitters over the token stream: Misra-Gries O(k)
    // candidates + exact recount, phi = 1/200 — the dominance report
    // without a corpus-wide distinct-token shuffle.
    "q229_heavy_hitters" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      graft.operators.Profiler.heavyHitters(toks, "tok", phiDen = 200)
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

    // Seasonal-naive forecast BACKTEST (r15): MASE/MAE over the last-7
    // test window of the daily count series (period 7) — the
    // "forecastable at all?" gate in front of q242/q243/q250. Exact
    // long errors, one division of two exact products.
    "q324_forecast_backtest" -> ((s, d) => {
      val daily = Tables.events(s, d).filter(col("ts").isNotNull)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("cnt"))
      graft.operators.TimeSeries.forecastBacktest(daily, Seq("event_type"),
          "day", "cnt", period = 7, horizon = 7)
        .orderBy(col("event_type"))
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

    // Pearson correlation per return flag from exact decimal sufficient
    // statistics — deterministic under any sharding, no float corpus sums.
    "q195_corr" -> ((s, d) => {
      Profiler.pearsonByGroup(Tables.lineitem(s, d),
        Seq("l_returnflag"), "l_quantity", "l_extendedprice", decimalScale = 2)
        .orderBy(col("l_returnflag"))
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

    // Per-language value-distribution histogram of n_chars: 16 equal-width
    // bins over a literal domain, out-of-domain values clamped to the edge
    // bins — integer bucket arithmetic shared with the z-order bucketizer.
    "q144_histogram" -> ((s, d) => {
      Profiler.histogram(Tables.documents(s, d), "n_chars", Seq("lang"),
        minV = 0L, maxV = 4095L, bins = 16)
        .orderBy(col("lang"), col("bin"))
    }),
  )

  // q203: q92's score expression verbatim, then the binning/grid
  // aggregation mirrored op for op. Shared with q262 (the streaming
  // drain of the same rows).
  private val reliabilityCardOracle: String = s"""
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
      FROM card ORDER BY bin"""

  // q214: the q144 bin arithmetic per vintage, add-one smoothing, the
  // (pa-pb)*ln(pa/pb) contributions on the 1e-7 grid. Shared with
  // q263 (the streaming drain of the same live vintage).
  private val psiOracle: String = """
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
      FROM c"""

  def oracles: Map[String, String] = Map(

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

    "q154_quantile_norm" -> """
      WITH r AS (SELECT doc_id, source, n_chars,
                        row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) - 1 AS rank,
                        count(*) OVER (PARTITION BY source) AS n
                 FROM documents)
      SELECT doc_id, source, n_chars,
             CASE WHEN n > 1 THEN round(CAST(rank AS DOUBLE) / (n - 1), 6) ELSE 0.0 END AS pct
      FROM r ORDER BY doc_id""",

    "q153_histogram_drift" -> """
      WITH a AS (SELECT (least(greatest(n_chars, 0), 4095) * 16) // 4096 AS bin, count(*) AS ca
                 FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
      b AS (SELECT (least(greatest(n_chars, 0), 4095) * 16) // 4096 AS bin, count(*) AS cb
            FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
      m AS (SELECT coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
            FROM a FULL OUTER JOIN b USING (bin)),
      t AS (SELECT CAST(sum(ca) AS DOUBLE) AS ta, CAST(sum(cb) AS DOUBLE) AS tb FROM m)
      SELECT round(sum(abs(ca/ta - cb/tb)) / 2.0, 6) AS tv_distance FROM m CROSS JOIN t""",

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

    "q180_rank_battery" -> """
      SELECT o_orderkey, o_orderstatus,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey""",

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

    "q144_histogram" -> """
      SELECT lang, (least(greatest(n_chars, 0), 4095) * 16) // 4096 AS bin, count(*) AS cnt
      FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",

    "q128_table_profile" -> tableProfileOracle,
    "q209_profile_drift" -> profileDriftOracle,

    "q214_psi" -> psiOracle,
    // q263 drains the SAME live vintage through the streaming fold
    // against the same reference histogram -- its oracle IS q214's.
    "q263_streaming_drift" -> psiOracle,

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
    "q237_welch_ttest" -> welchOracle,
    "q255_brier" -> brierOracle,
    "q256_isotonic" -> isotonicOracle,
    "q257_calibrated_brier" -> calibratedBrierOracle,
    "q258_oos_calibration" -> oosCalibrationOracle,

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

    // q324: the daily-count series indexed per key; test = last 7 rows,
    // forecast source = lag 7 (always train), scale = train one-step
    // diffs; MASE as one division of two exact long products.
    "q324_forecast_backtest" -> """
      WITH daily AS (SELECT event_type,
                            CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                              AS BIGINT) AS day,
                            CAST(count(*) AS BIGINT) AS cnt
                     FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      idx AS (SELECT event_type, day, cnt,
                     row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
                     count(*) OVER (PARTITION BY event_type) AS n,
                     lag(cnt, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev,
                     lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY day) AS src
              FROM daily),
      agg AS (SELECT event_type,
                     CAST(max(n - 7) AS BIGINT) AS n_train,
                     CAST(sum(CASE WHEN i > n - 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
                     CAST(sum(CASE WHEN i > n - 7 THEN abs(cnt - src) END) AS BIGINT) AS sum_err,
                     CAST(sum(CASE WHEN i <= n - 7 AND i >= 2 THEN abs(cnt - prev) END)
                       AS BIGINT) AS sum_scale
              FROM idx WHERE n >= 15 GROUP BY event_type)
      SELECT event_type, n_train, n_test,
             round(CAST(sum_err AS DOUBLE) / CAST(n_test AS DOUBLE), 6) AS mae,
             CASE WHEN sum_scale > 0
                  THEN round(CAST(sum_err * (n_train - 1) AS DOUBLE)
                             / CAST(sum_scale * n_test AS DOUBLE), 6)
             END AS mase
      FROM agg ORDER BY event_type""",

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

    // q262 drains the SAME scored rows through the streaming fold — by
    // the drain≡batch contract its oracle IS q203's.
    "q262_streaming_calibration" -> reliabilityCardOracle,

    // q269: the same top-(k+1) multiset by value order (boundary ties
    // swap equal values — multiset-invariant), per-term ln on the 1e-7
    // grid, exact long sum, the closed form mirrored.
    "q269_hill_tail" -> """
      WITH t AS (SELECT CAST(n_chars AS DOUBLE) AS x FROM documents
                 WHERE CAST(n_chars AS DOUBLE) > 0.0
                 ORDER BY x DESC LIMIT 201),
      s AS (SELECT count(*) AS c,
                   sum(CAST(floor(ln(x) * 10000000.0 + 0.5) AS BIGINT)) AS sl7,
                   min(x) AS xm
            FROM t),
      -- the c = 201 guard mirrors the operator's loud underfull error:
      -- an underfull tail yields ZERO oracle rows, never a confidently
      -- wrong hill from a silent short LIMIT
      h AS (SELECT CAST(200 AS BIGINT) AS n_tail, xm AS x_tail_min,
                   CAST(floor(CAST(sl7 - c * CAST(floor(ln(xm) * 10000000.0 + 0.5)
                          AS BIGINT) AS DOUBLE)
                        / 10000000.0 / 200.0 * 1000000.0 + 0.5) AS DOUBLE)
                     / 1000000.0 AS hill
            FROM s WHERE c = 201)
      SELECT n_tail, x_tail_min, hill,
             CASE WHEN hill > CAST(0.0 AS DOUBLE)
                  THEN CAST(floor(CAST(1.0 AS DOUBLE) / hill * 1000000.0 + 0.5)
                       AS DOUBLE) / 1000000.0
             END AS alpha
      FROM h""",

    // q267: the same single-stats-CTE shape as q266 over the
    // null-injected live values. pass is coalesced to false so the oracle
    // mirrors the operator's fail-closed rule on an all-null column (where
    // min/max aggregate to SQL NULL) instead of silently diverging.
    "q267_streaming_contract" -> """
      WITH v AS (SELECT CASE WHEN event_type = 'error' THEN NULL
                             ELSE value END AS v
                 FROM events),
      s AS (SELECT
        CAST(floor(min(v) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS mn,
        CAST(floor(max(v) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS mx,
        CAST(floor(CAST(count(*) FILTER (WHERE v IS NULL) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
          / 1000000.0 AS nf
      FROM v)
      SELECT col_name, kind, bound, observed, pass FROM (
        SELECT 'value' AS col_name, 'min_ge' AS kind,
               CAST(0.0 AS DOUBLE) AS bound, mn AS observed,
               coalesce(mn >= CAST(0.0 AS DOUBLE), false) AS pass FROM s
        UNION ALL
        SELECT 'value', 'max_le', CAST(100.0 AS DOUBLE), mx,
               coalesce(mx <= CAST(100.0 AS DOUBLE), false) FROM s
        UNION ALL
        SELECT 'value', 'null_frac_le', CAST(0.25 AS DOUBLE), nf,
               coalesce(nf <= CAST(0.25 AS DOUBLE), false) FROM s)
      ORDER BY kind""",

    // q275: the KMV estimator re-derived from scratch — distinct 60-bit
    // md5 hashes, 64 smallest, (k-1)·2^60/h_k (exact count when the
    // sketch never filled), 1e-6 grid, rule rows with the estimate flag.
    "q275_streaming_distinct" -> s"""
      WITH h AS (SELECT DISTINCT ${PackShared.duckKeyHash("doc_id", "card1")} AS hv
                 FROM documents),
      tk AS (SELECT hv FROM h ORDER BY hv LIMIT 64),
      est AS (SELECT count(*) AS c, max(hv) AS hk FROM tk),
      o AS (SELECT
        CAST(floor((CASE WHEN c < 64 THEN CAST(c AS DOUBLE)
                         ELSE 63.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE) END)
                   * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS observed,
        (c = 64) AS estimated
      FROM est)
      SELECT col_name, kind, bound, observed, pass, estimated FROM (
        SELECT 'doc_id' AS col_name, 'distinct_ge' AS kind,
               CAST(100.0 AS DOUBLE) AS bound, observed,
               coalesce(observed >= CAST(100.0 AS DOUBLE), false) AS pass,
               estimated FROM o
        UNION ALL
        SELECT 'doc_id', 'distinct_le', CAST(1000000.0 AS DOUBLE), observed,
               coalesce(observed <= CAST(1000000.0 AS DOUBLE), false),
               estimated FROM o)
      ORDER BY kind""",

    // q287: each event expanded to its 4 epoch-aligned sliding-window
    // starts (15-min grid, 1-hour span).
    "q287_sliding_window" -> """
      WITH offs AS (SELECT unnest(range(0, 4)) AS o),
      w AS (SELECT CAST(to_timestamp((epoch_us(ts) // 900000000 - o.o) * 900) AS TIMESTAMP) AS bucket,
                   event_type
            FROM events CROSS JOIN offs o
            WHERE ts IS NOT NULL)
      SELECT bucket, event_type, count(*) AS cnt
      FROM w GROUP BY bucket, event_type
      ORDER BY bucket, event_type""",

    // q309: one epoch-aligned hourly bucket per event.
    "q309_tumbling_counts" -> """
      SELECT CAST(to_timestamp((epoch_us(ts) // 3600000000) * 3600) AS TIMESTAMP) AS bucket,
             event_type, count(*) AS cnt
      FROM events WHERE ts IS NOT NULL
      GROUP BY bucket, event_type
      ORDER BY bucket, event_type""",

    // q298: the drained form answers to q287's exact oracle — the drain
    // must produce the batch window assignment.
    "q298_sliding_drain" -> """
      WITH offs AS (SELECT unnest(range(0, 4)) AS o),
      w AS (SELECT CAST(to_timestamp((epoch_us(ts) // 900000000 - o.o) * 900) AS TIMESTAMP) AS bucket,
                   event_type
            FROM events CROSS JOIN offs o
            WHERE ts IS NOT NULL)
      SELECT bucket, event_type, count(*) AS cnt
      FROM w GROUP BY bucket, event_type
      ORDER BY bucket, event_type""",

    // q293: q42's gaps-and-islands, counts only.
    "q293_session_counts" -> """
      WITH g AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 3 HOUR
                    THEN 1 ELSE 0 END AS new_s
        FROM events WHERE ts IS NOT NULL),
      i AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM g)
      SELECT min(ts) AS session_start, user_id, CAST(count(*) AS BIGINT) AS cnt
      FROM i GROUP BY user_id, sid ORDER BY user_id, session_start""",

    // q300: the drained form answers to q293's exact oracle — session
    // merging across micro-batches must converge on the batch islands.
    "q300_session_drain" -> """
      WITH g AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 3 HOUR
                    THEN 1 ELSE 0 END AS new_s
        FROM events WHERE ts IS NOT NULL),
      i AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM g)
      SELECT min(ts) AS session_start, user_id, CAST(count(*) AS BIGINT) AS cnt
      FROM i GROUP BY user_id, sid ORDER BY user_id, session_start""",

    // q266: each expectation mirrored as one row off a single stats CTE;
    // observed values on the same 1e-6 grid / exact distinct counts.
    "q266_expectations" -> """
      WITH s AS (SELECT
        CAST(count(DISTINCT doc_id) AS DOUBLE) AS nd_doc,
        CAST(floor(CAST(count(*) FILTER (WHERE text IS NULL) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
          / 1000000.0 AS nf_text,
        CAST(floor(min(CAST(n_chars AS DOUBLE)) * 1000000.0 + 0.5) AS DOUBLE)
          / 1000000.0 AS min_nc,
        CAST(floor(max(CAST(n_chars AS DOUBLE)) * 1000000.0 + 0.5) AS DOUBLE)
          / 1000000.0 AS max_nc,
        CAST(count(DISTINCT lang) AS DOUBLE) AS nd_lang,
        CAST(count(DISTINCT source) AS DOUBLE) AS nd_src
      FROM documents)
      SELECT col_name, kind, bound, observed, pass FROM (
        SELECT 'doc_id' AS col_name, 'distinct_ge' AS kind,
               CAST(100.0 AS DOUBLE) AS bound, nd_doc AS observed,
               coalesce(nd_doc >= CAST(100.0 AS DOUBLE), false) AS pass FROM s
        UNION ALL
        SELECT 'text', 'null_frac_le', CAST(0.0 AS DOUBLE), nf_text,
               coalesce(nf_text <= CAST(0.0 AS DOUBLE), false) FROM s
        UNION ALL
        SELECT 'n_chars', 'min_ge', CAST(0.0 AS DOUBLE), min_nc,
               coalesce(min_nc >= CAST(0.0 AS DOUBLE), false) FROM s
        UNION ALL
        SELECT 'n_chars', 'max_le', CAST(100000.0 AS DOUBLE), max_nc,
               coalesce(max_nc <= CAST(100000.0 AS DOUBLE), false) FROM s
        UNION ALL
        SELECT 'lang', 'distinct_le', CAST(16.0 AS DOUBLE), nd_lang,
               coalesce(nd_lang <= CAST(16.0 AS DOUBLE), false) FROM s
        UNION ALL
        SELECT 'source', 'distinct_le', CAST(64.0 AS DOUBLE), nd_src,
               coalesce(nd_src <= CAST(64.0 AS DOUBLE), false) FROM s)
      ORDER BY col_name, kind""",

    "q203_reliability_card" -> reliabilityCardOracle,

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
  )
}
