package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample irregular per-key events onto a
  * fixed-width bucket grid and forward-fill the gaps — the step between
  * raw telemetry/event streams and anything that wants one row per
  * (key, interval): feature windows, training targets, monitoring rollups.
  *
  * Shape at 100 TB: everything is keyed on the series key — the per-bucket
  * aggregate is one map-side-combined shuffle, the grid is a per-key
  * `sequence` explode (bounded by span/bucket, a parameter the caller
  * controls via `bucketWidth`), and the forward fill is a per-key ordered
  * window. Keys are numerous (users/devices/sensors), so the windows run
  * wide in parallel; nothing orders globally. A single pathologically long
  * series is bounded by its span, not its event count — the aggregate has
  * already collapsed events to one row per bucket.
  *
  * (The reference has no time-series operators; training-data-pipeline
  * surface, SURVEY §2.2.)
  */
object TimeSeries {

  /** Integer floor division via decimal — same exactness argument as
    * [[RangeJoin]]'s bucketizer: Column `/` is double division and loses
    * bucket exactness past 2^53. */
  private def bucketOf(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")

  /** One row per (key, bucket) over each key's [min, max] bucket span:
    * `agg` of the in-bucket values where events exist, the previous
    * bucket's filled value where they don't (forward fill; leading buckets
    * before a key's first event cannot occur since the grid starts at the
    * key's own minimum). `tsCol` is numeric (e.g. `unix_micros(ts)`).
    * Output: (keyCol, bucket, value).
    */
  def resampleForwardFill(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      bucketWidth: Long,
      agg: Column => Column = max
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val perBucket = df
      .select(col(keyCol), bucketOf(col(tsCol), bucketWidth).as("bucket"), col(valueCol))
      .groupBy(col(keyCol), col("bucket"))
      .agg(agg(col(valueCol)).as("__v"))
    val grid = perBucket
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .select(col(keyCol), explode(sequence(col("__b0"), col("__b1"))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // BOTH join sides are corpus-sized derivatives (the grid IS the output
    // row count; perBucket is an aggregate) whose static size estimates are
    // garbage — pin sort-merge so neither gets broadcast (the measured
    // derived-broadcast OOM class; PlanAudit flagged exactly this join).
    grid
      .join(perBucket.hint("shuffle_merge"), Seq(keyCol, "bucket"), "left")
      .withColumn("value", last(col("__v"), ignoreNulls = true).over(w))
      .select(col(keyCol), col("bucket"), col("value"))
  }

  /** Rolling z-score anomaly flag — the monitoring primitive over per-key
    * event values: each row's value is scored against the mean/stddev of
    * its own key's `lookback` PRIOR rows (frame ends at −1, so the tested
    * value never contaminates its own baseline — the standard leakage
    * bug). Rows with fewer than 2 prior values or zero variance emit a
    * null z-score and never flag. z rounds to 4 (window sums are float
    * folds — the established cross-engine quantization).
    *
    * Shape at 100 TB: ONE per-key ordered window (keys are
    * users/devices/sensors, so windows run wide; a key's cost is its own
    * row count) — no self-join, no global sort. Population stddev, so
    * both engines share the closed-form definition.
    */
  def rollingZScore(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueCol: String,
      lookback: Int,
      threshold: Double
  ): DataFrame = {
    require(lookback >= 2, s"lookback must be >= 2, got $lookback")
    require(threshold > 0.0, s"threshold must be positive, got $threshold")
    require(orderCols.nonEmpty,
      "orderCols must include a tie-breaking unique suffix — a bare event-time " +
        "order is nondeterministic under timestamp collisions")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(-lookback, -1)
    val prior = count(col(valueCol)).over(w)
    val mean = avg(col(valueCol)).over(w)
    val sd = stddev_pop(col(valueCol)).over(w)
    val z = when(prior >= 2 && sd > 0.0,
      round((col(valueCol) - mean) / sd, 4))
    df.select(col(keyCol) +: orderCols.map(col) :+ col(valueCol): _*)
      .withColumn("zscore", z)
      .withColumn("is_anomaly", coalesce(abs(col("zscore")) > threshold, lit(false)))
  }

  /** Per-key serial fold over the (key, orderCols)-sorted rows — the
    * secondary-sort pattern: one hash repartition on the key, an in-
    * partition sort, then a streaming mapPartitions whose state resets at
    * each key boundary. O(1) memory per task regardless of series length,
    * every key's fold strictly serial in event order (which is what makes
    * a RECURSIVE statistic bitwise-reproducible: both engines fold the
    * same doubles in the same order). This is the one legitimate
    * mapPartitions case — ewma/cusum are order-recursive, and the only
    * window rewrite (Σ αⁱ·xᵢ prefix trick) overflows α^(-i) after ~700
    * rows. Keys are numerous; a hot key costs its series length, same
    * contract as [[rollingZScore]].
    */
  private def foldByKey(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueCol: String,
      stateCols: Seq[String],
      init: Double => Seq[Double],
      step: (Seq[Double], Double) => Seq[Double]
  ): DataFrame = {
    require(orderCols.nonEmpty,
      "orderCols must include a tie-breaking unique suffix after the event time")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.DoubleType
    val typed = df.withColumn(valueCol, col(valueCol).cast("double"))
    val sorted = typed
      .repartition(col(keyCol))
      .sortWithinPartitions((keyCol +: orderCols).map(col): _*)
    val schema = stateCols.foldLeft(sorted.schema)((s, c) => s.add(c, DoubleType))
    val kI = sorted.schema.fieldIndex(keyCol)
    val vI = sorted.schema.fieldIndex(valueCol)
    sorted.mapPartitions { rows =>
      var curKey: Any = null
      var started = false
      var state: Seq[Double] = Nil
      rows.map { r =>
        val k = r.get(kI)
        val x = r.getDouble(vI)
        if (!started || k != curKey) { curKey = k; started = true; state = init(x) }
        else state = step(state, x)
        Row.fromSeq(r.toSeq ++ state)
      }
    }(Encoders.row(schema))
  }

  /** Exponentially-weighted moving average per key:
    * `ewma₀ = x₀; ewmaₜ = α·xₜ + (1−α)·ewmaₜ₋₁` in strict
    * (orderCols) order — the smoothing baseline behind drift monitors and
    * rate limiters. Pick α with an exact binary representation (0.25,
    * 0.5, …) when an independent engine must reproduce the fold: then
    * `1−α` is exact too and the serial fold is bitwise identical.
    * Output adds `ewma` (round 6). */
  def ewmaByKey(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueCol: String,
      alpha: Double
  ): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val oneMinus = 1.0 - alpha
    foldByKey(df, keyCol, orderCols, valueCol, Seq("__ewma_raw"),
      init = x => Seq(x),
      step = (s, x) => Seq(alpha * x + oneMinus * s.head))
      .withColumn("ewma", quantize6(col("__ewma_raw")))
      .drop("__ewma_raw")
  }

  /** Scaled-floor quantization to 6 decimals: `floor(x·10⁶ + 0.5)/10⁶` —
    * every step an IEEE double op, so ANY engine reproduces it bitwise.
    * `round()` does NOT have that property: Spark rounds the exact
    * decimal expansion (BigDecimal) while DuckDB rounds the scaled
    * float, and they disagree whenever x·10⁶ lands on .5 through
    * scaling error (measured: 3 rows in 10k on the EWMA stream). Serial
    * folds hit rounding boundaries constantly — quantize them with
    * arithmetic the fold itself is made of. Also kills signed zero:
    * floor of anything in (−0.5, 0.5) is +0. */
  private def quantize6(c: Column): Column =
    graft.functions.Quantize.scaledFloor(c, 6)

  /** Two-sided CUSUM change detection per key (Page 1954):
    * `S⁺ₜ = max(0, S⁺ₜ₋₁ + (xₜ − target − slack))`,
    * `S⁻ₜ = max(0, S⁻ₜ₋₁ + (target − slack − xₜ))`, alarm when either
    * side exceeds `threshold` — the standard mean-shift monitor (EWMA
    * smooths; CUSUM accumulates evidence, catching small sustained
    * shifts a z-score window misses). States start at 0 (the first row
    * already contributes its deviation). Output adds `cusum_pos`,
    * `cusum_neg` (round 6) and `alarm`. */
  def cusumByKey(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      valueCol: String,
      target: Double,
      slack: Double,
      threshold: Double
  ): DataFrame = {
    require(slack >= 0.0 && threshold > 0.0, "slack must be >= 0, threshold positive")
    foldByKey(df, keyCol, orderCols, valueCol, Seq("__cp", "__cn"),
      init = x => Seq(
        math.max(0.0, x - target - slack),
        math.max(0.0, target - slack - x)),
      step = (s, x) => Seq(
        math.max(0.0, s.head + (x - target - slack)),
        math.max(0.0, s(1) + (target - slack - x))))
      .withColumn("cusum_pos", quantize6(col("__cp")))
      .withColumn("cusum_neg", quantize6(col("__cn")))
      .withColumn("alarm", col("__cp") > threshold || col("__cn") > threshold)
      .drop("__cp", "__cn")
  }

  /** Exponentially time-decayed event counts per key — the TRENDING
    * score (Hacker-News/Reddit-style freshness weighting, and the
    * streaming-analytics "decayed counter"): each event contributes
    * `2^(−Δ/halfLife)` with Δ its age in seconds relative to the
    * corpus's max event time (an exact in-plan aggregate — no wall
    * clock, so the score is a pure function of the data). A key with
    * 100 events all one half-life old scores 50; recency beats raw
    * volume, which a plain count can never express.
    *
    * Each contribution quantizes to a 1e-9 integer grid before the
    * per-key LONG sum (the klFromCorpus convention — order-free,
    * engine-exact modulo cross-engine `pow` ulps against grid
    * boundaries, the accepted q172 class). Shape: one 1-row max
    * aggregate broadcast back (the q35 scalar class), one pure decay
    * projection, ONE keyed map-side-combined aggregation. Output:
    * (keyCol, n_events, decayed_count).
    */
  def decayedCounts(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      halfLifeSecs: Double
  ): DataFrame = {
    require(halfLifeSecs > 0.0, s"halfLifeSecs must be positive, got $halfLifeSecs")
    // null-timestamp events carry no age and are EXCLUDED outright — both
    // columns must describe the same event set (counting them while the
    // decay sum skipped them would silently deflate decayed/n ratios)
    val timed = df.filter(col(tsCol).isNotNull)
    val ref = timed.agg(max(unix_micros(col(tsCol))).as("__ref"))
    timed.select(col(keyCol), unix_micros(col(tsCol)).as("__t"))
      .crossJoin(broadcast(ref))
      .withColumn("__c9",
        floor(pow(lit(2.0),
          -((col("__ref") - col("__t")).cast("double") / 1e6 / lit(halfLifeSecs)))
          * 1e9 + lit(0.5)).cast("long"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("__c9")).as("__s9"))
      .select(col(keyCol), col("n_events"),
        graft.functions.Quantize.scaledFloor(
          col("__s9").cast("double") / 1e9, 6).as("decayed_count"))
  }

  /** Kaplan–Meier survival estimator — retention with CENSORING handled
    * honestly (the thing a plain cohort-retention curve gets wrong: a
    * user last seen yesterday hasn't churned, they just haven't had time
    * to — treating them as churned biases every duration short).
    * Input: one row per subject with an integral `durationCol` and a
    * boolean `observedCol` (true = the terminal event happened; false =
    * censored at that duration). At each distinct observed-event time t:
    * `S(t) = Π_{s ≤ t} (1 − d_s/n_s)` with `d_s` events and `n_s` the
    * at-risk count (duration ≥ s).
    *
    * Determinism: d/n are exact integers per distinct duration; the
    * product accumulates as a cumulative sum of per-step `ln(1 − d/n)`
    * terms quantized to the 1e-9 grid (order-free within the window
    * frame); a step where EVERYONE at risk dies (d = n) would be
    * ln(0) — Spark's sum-over-window SKIPS nulls, which would silently
    * resurrect the curve, so extinction is carried as a separate
    * cumulative max flag forcing S = 0 from that step on. Censored-only
    * durations don't emit a row (they step nothing) but DO deplete the
    * at-risk count via the cumulative window.
    *
    * Shape: one per-duration counting aggregation, one duration-ordered
    * window over the DISTINCT-duration frame, one 1-row total broadcast.
    * Output: (duration, n_risk, n_events, survival) at observed steps.
    */
  def kaplanMeier(
      df: DataFrame,
      durationCol: String,
      observedCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(durationCol).cast("long").as("__t"),
      col(observedCol).cast("boolean").as("__o"))
      .filter(col("__t").isNotNull && col("__o").isNotNull)
    val perT = base.groupBy(col("__t"))
      .agg(count(when(col("__o"), 1)).as("__d"), count(lit(1)).as("__all"))
    val total = perT.agg(sum(col("__all")).as("__n"))
    // UNPARTITIONED-WINDOW: distinct-duration frame, WindowGuard-ed
    val wPrior = Window.orderBy(col("__t")).rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perT.crossJoin(broadcast(total))
      .withColumn("__risk", WindowGuard.guarded(
        col("__n") - coalesce(sum(col("__all")).over(wPrior), lit(0L)),
        Seq(col("__t")), "kaplanMeier"))
      .withColumn("__ln9",
        when(col("__d") < col("__risk"),
          floor(log(lit(1.0) - col("__d").cast("double") / col("__risk").cast("double"))
            * 1e9 + lit(0.5)).cast("long"))
          .otherwise(lit(0L))) // d = n: handled by the extinction flag
      .withColumn("__dead",
        max(when(col("__d") === col("__risk") && col("__d") > 0L, 1).otherwise(0))
          .over(wCum))
      .withColumn("__cum9", sum(col("__ln9")).over(wCum))
      .filter(col("__d") > 0L)
      .select(col("__t").as("duration"), col("__risk").as("n_risk"),
        col("__d").as("n_events"),
        when(col("__dead") === 1, lit(0.0))
          .otherwise(graft.functions.Quantize.scaledFloor(
            exp(col("__cum9").cast("double") / 1e9), 6)).as("survival"))
  }

  /** Autocorrelation function per key: Pearson r between the series and
    * its lag-ℓ shifted self for ℓ = 1…maxLag — the seasonality detector
    * that tells [[seasonalBaseline]] WHICH period to baseline on (a
    * daily-count series with weekly rhythm spikes at lag 7) and flags
    * regime stickiness (high lag-1) before [[cusumByKey]] fires.
    *
    * Input contract: one observation per (key, x) on an integer time
    * grid (a calendar-bucketed count frame). Pairs at lag ℓ join
    * (x, x+ℓ) — only OBSERVED pairs correlate (a gap shortens n, it
    * does not zero-fill). The correlation is [[Profiler.pearsonByGroup]]
    * verbatim — exact decimal sufficient statistics, deterministic under
    * any sharding; r is null when either side is constant over the
    * overlap.
    *
    * Shape: one maxLag-wide explode + one two-key SMJ equi-join
    * ((key, x+lag) = (key, x), series-sized both sides) into the keyed
    * sufficient-statistics aggregation. Output: (keyCol, lag, n, r).
    */
  def autocorrelation(
      df: DataFrame,
      keyCol: String,
      xCol: String,
      yCol: String,
      maxLag: Int
  ): DataFrame = {
    require(maxLag >= 1 && maxLag <= 256, s"maxLag=$maxLag out of [1, 256]")
    // referenced by both sides of the lag join; the caller's frame is
    // typically an aggregation — materialize once (series-sized)
    val pts = df.select(col(keyCol).as("__k"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("double").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .localCheckpoint(true)
    val lagged = pts
      .withColumn("lag", explode(sequence(lit(1), lit(maxLag))))
      .select(col("__k"), col("lag"), (col("__x") + col("lag")).as("__xj"),
        col("__y").as("__ya"))
    val pairs = lagged.join(
      pts.select(col("__k"), col("__x").as("__xj"), col("__y").as("__yb"))
        .hint("shuffle_merge"),
      Seq("__k", "__xj"))
    graft.operators.Profiler.pearsonByGroup(
      pairs, Seq("__k", "lag"), "__ya", "__yb", decimalScale = 2)
      .select(col("__k").as(keyCol), col("lag"), col("n"), col("r"))
  }

  /** Theil–Sen robust trend estimator per key: the median of all pairwise
    * slopes `(y_j − y_i)/(x_j − x_i)`, the trend line volume dashboards
    * should use instead of OLS (one spiky day drags a least-squares fit;
    * the pairwise-slope median has a 29% breakdown point — Sen 1968).
    *
    * Input contract: ONE observation per (key, x) — aggregate upstream
    * (a daily-count frame already is). Pairs are per-key QUADRATIC BY
    * CONTRACT (the q168 class): n_pairs = n(n−1)/2 where n is the
    * per-key series LENGTH (days of history, not corpus rows) — bounded
    * small by construction for calendar-bucketed series; don't feed
    * per-event points.
    *
    * Determinism: each slope quantizes to the 1e-9 integer grid as a
    * LONG; ranking orders by (slope₉, x_i, x_j) — a total integer order —
    * and the median averages the two middle grid values ((n+1)/2 and
    * n/2+1, the same row when n is odd), one exact division at the end.
    * Shape: one key-equi self-join (SMJ), one per-key rank window
    * (pair-count-sized), one keyed aggregation. Output:
    * (keyCol, n_points, n_pairs, slope); slope null when n_points < 2.
    */
  def theilSen(
      df: DataFrame,
      keyCol: String,
      xCol: String,
      yCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // referenced three times (point counts + both sides of the pair
    // self-join); the caller's frame is typically an aggregation —
    // materialize once (series-sized by contract), the hits discipline
    val pts = df.select(col(keyCol).as("__k"),
      col(xCol).cast("double").as("__x"), col(yCol).cast("double").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .localCheckpoint(true)
    val nPts = pts.groupBy(col("__k")).agg(count(lit(1)).as("n_points"))
    val pairs = pts
      .join(pts.select(col("__k"), col("__x").as("__x2"), col("__y").as("__y2"))
        .hint("shuffle_merge"), Seq("__k"))
      .filter(col("__x") < col("__x2"))
      .select(col("__k"), col("__x"), col("__x2"),
        floor((col("__y2") - col("__y")) / (col("__x2") - col("__x")) * 1e9 + lit(0.5))
          .cast("long").as("__s9"))
    val w = Window.partitionBy(col("__k"))
    val ranked = pairs
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(
        w.orderBy(col("__s9"), col("__x"), col("__x2"))))
    val med = ranked
      // Spark's `/` on longs yields DOUBLE — cast back for exact ranks
      .withColumn("__k1", ((col("__n") + 1L) / 2L).cast("long"))
      .withColumn("__k2", (col("__n") / 2L).cast("long") + 1L)
      .filter(col("__rn") === col("__k1") || col("__rn") === col("__k2"))
      .groupBy(col("__k"))
      .agg(max(col("__n")).as("n_pairs"),
        sum(col("__s9")).as("__ms"), count(lit(1)).as("__mc"))
      .select(col("__k"), col("n_pairs"),
        graft.functions.Quantize.scaledFloor(
          col("__ms").cast("double") / col("__mc").cast("double") / 1e9, 9).as("slope"))
    nPts.join(med.hint("shuffle_merge"), Seq("__k"), "left")
      .select(col("__k").as(keyCol), col("n_points"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("slope"))
  }

  /** Seasonal-baseline deviation per (key, hour-of-day): pre-cutoff
    * events build the expected hourly RATE profile, post-cutoff actuals
    * compare against it — the "traffic at 3am doubled" detector that a
    * plain day-over-day diff misses because volume is hour-shaped
    * (nightly-batch spikes look like incidents against a flat baseline
    * and vanish against the seasonal one).
    *
    * Rates are per-DAY so unequal window lengths compare honestly:
    * `expected = pre_cnt / pre_days`, `actual = post_cnt / post_days`
    * with day counts = distinct calendar dates observed in each window
    * (1-row broadcasts). `ratio = (post_cnt·pre_days)/(pre_cnt·post_days)`
    * — exact-integer-input division, null when the slot has no baseline
    * (a NEW slot is its own kind of anomaly; flagged separately).
    * `anomalous` = ratio outside [lo, hi] or a new slot. Null timestamps
    * are excluded. All outputs scaledFloor-quantized.
    *
    * Shape: two keyed counting aggregations + one slot-bounded
    * (|keys|×24) full-outer join + two 1-row scalars — map-side combined
    * throughout, stream-safe per micro-batch over the persisted pre
    * profile. Output: (keyCol, hour, pre_cnt, post_cnt, expected_rate,
    * actual_rate, ratio, anomalous).
    */
  def seasonalBaseline(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      cutoff: Column,
      lo: Double = 0.5,
      hi: Double = 2.0
  ): DataFrame = {
    require(lo > 0.0 && hi > lo, s"need 0 < lo < hi, got lo=$lo hi=$hi")
    val timed = df.filter(col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"))
    val pre = timed.filter(col("__ts") < cutoff)
    val post = timed.filter(col("__ts") >= cutoff)
    def slots(side: DataFrame, cnt: String) =
      side.select(col("__k"), hour(col("__ts")).as("hour"))
        .groupBy(col("__k"), col("hour")).agg(count(lit(1)).as(cnt))
    def days(side: DataFrame, nm: String) =
      side.agg(countDistinct(to_date(col("__ts"))).as(nm))
    val merged = slots(pre, "pre_cnt")
      .join(slots(post, "post_cnt"), Seq("__k", "hour"), "full_outer")
      .select(col("__k"), col("hour"),
        coalesce(col("pre_cnt"), lit(0L)).as("pre_cnt"),
        coalesce(col("post_cnt"), lit(0L)).as("post_cnt"))
    merged
      .crossJoin(broadcast(days(pre, "__pd")))
      .crossJoin(broadcast(days(post, "__qd")))
      .select(col("__k").as(keyCol), col("hour"), col("pre_cnt"), col("post_cnt"),
        graft.functions.Quantize.scaledFloor(
          col("pre_cnt").cast("double") / col("__pd").cast("double"), 6)
          .as("expected_rate"),
        graft.functions.Quantize.scaledFloor(
          col("post_cnt").cast("double") / col("__qd").cast("double"), 6)
          .as("actual_rate"),
        when(col("pre_cnt") > 0L, graft.functions.Quantize.scaledFloor(
          (col("post_cnt") * col("__pd")).cast("double") /
            (col("pre_cnt") * col("__qd")).cast("double"), 6)).as("ratio"),
        (col("pre_cnt") === 0L ||
          (col("pre_cnt") > 0L &&
            ((col("post_cnt") * col("__pd")).cast("double") <
              (col("pre_cnt") * col("__qd")).cast("double") * lit(lo) ||
              (col("post_cnt") * col("__pd")).cast("double") >
                (col("pre_cnt") * col("__qd")).cast("double") * lit(hi))))
          .as("anomalous"))
  }

  /** Two-sample log-rank test (Mantel–Cox) — "do these survival curves
    * differ", the significance gate on top of [[kaplanMeier]] (which only
    * DRAWS each curve): at every event time t, observed group-a events
    * vs the hypergeometric expectation `d_t·n_at/n_t` given the at-risk
    * split, summed into `χ² = (Σ(O−E))²/ΣV` with
    * `V_t = d_t·(n_at/n_t)·(1−n_at/n_t)·(n_t−d_t)/(n_t−1)`.
    *
    * At-risk counts come from exact integer cumulative-exit windows over
    * the distinct-duration grid (grid-sized BY CONTRACT — durations are
    * calendar-bucketed, the kaplanMeier input rule); the per-time O−E and
    * V rationals are 1e-9-quantized and decimal-summed (the anova term
    * discipline), so the statistic is engine- and order-exact. Censored
    * exits leave the risk set without contributing events — censoring is
    * handled exactly as the KM estimator does. Output 1 row:
    * (n_a, n_b, events_a, events_b, o_minus_e_a, var_sum, chi2) —
    * chi2 null when ΣV = 0 (no comparable event times).
    */
  def logRank(
      df: DataFrame,
      groupCol: String,
      durationCol: String,
      observedCol: String,
      groupA: String,
      groupB: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q9 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 9)
    val q6c = (c: Column) => graft.functions.Quantize.scaledFloor(c, 6)
    val base = df
      .filter(col(durationCol).isNotNull && col(observedCol).isNotNull &&
        (col(groupCol) === groupA || col(groupCol) === groupB))
      .select((col(groupCol) === groupA).as("__a"),
        col(durationCol).cast("long").as("__t"),
        col(observedCol).cast("boolean").as("__o"))
      .localCheckpoint(true) // scanned by perT AND the totals aggregate
    val perT = base.groupBy(col("__t")).agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("__xa"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("__xb"),
      sum(when(col("__a") && col("__o"), 1L).otherwise(0L)).as("__da"),
      sum(when(!col("__a") && col("__o"), 1L).otherwise(0L)).as("__db"))
    val tot = base.agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__a") && col("__o"), 1L).otherwise(0L)).as("events_a"),
      sum(when(!col("__a") && col("__o"), 1L).otherwise(0L)).as("events_b"))
      .localCheckpoint(true) // 1 row, referenced by risks AND the readout
    // UNPARTITIONED-WINDOW: distinct-duration frame, WindowGuard-ed
    val wBefore = Window.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risks = perT.crossJoin(broadcast(tot))
      .withColumn("__na", WindowGuard.guarded(
        col("n_a") - coalesce(sum(col("__xa")).over(wBefore), lit(0L)),
        Seq(col("__t")), "logRank"))
      .withColumn("__nb", col("n_b") - coalesce(sum(col("__xb")).over(wBefore), lit(0L)))
      .filter(col("__da") + col("__db") >= 1L)
    def d(c: String) = col(c).cast("double")
    val n = d("__na") + d("__nb")
    val dt = d("__da") + d("__db")
    val ea = dt * d("__na") / n
    val v = when(n > 1.0,
      dt * (d("__na") / n) * (lit(1.0) - d("__na") / n) * (n - dt) / (n - 1.0))
      .otherwise(lit(0.0))
    val terms = risks.select(
      q9(d("__da") - ea).cast("decimal(18,9)").as("__ome"),
      q9(v).cast("decimal(18,9)").as("__v"))
    val sums = terms.agg(
      sum(col("__ome")).cast("decimal(38,9)").as("__some"),
      sum(col("__v")).cast("decimal(38,9)").as("__sv"))
    tot.crossJoin(broadcast(sums))
      .select(col("n_a"), col("n_b"), col("events_a"), col("events_b"),
        q6c(coalesce(col("__some"), lit(0).cast("decimal(38,9)")).cast("double"))
          .as("o_minus_e_a"),
        q6c(coalesce(col("__sv"), lit(0).cast("decimal(38,9)")).cast("double"))
          .as("var_sum"),
        when(coalesce(col("__sv"), lit(0).cast("decimal(38,9)")) > 0,
          q6c(col("__some").cast("double") * col("__some").cast("double") /
            col("__sv").cast("double"))).as("chi2"))
  }

  /** Single change-point per key by exact binary segmentation: over the
    * time-ordered series, the split s minimizing
    * `SSE(rows ≤ s) + SSE(rows > s)` — the level-shift localizer (binary
    * segmentation's first cut; recurse on the halves when hunting
    * multiple breaks). [[cusumByKey]] FLAGS drift online; this names the
    * break point offline with an exact least-squares criterion.
    *
    * Every candidate's cost comes from exact decimal prefix sums
    * (cumulative n, Σv, Σv² over one per-key window), so each row's
    * cost is a fixed IEEE expression over exact inputs — deterministic on
    * any engine with no float accumulation. The winner is the earliest
    * time among cost minima (deterministic tie-break). Splits leaving
    * either side empty are excluded; keys with < 4 points emit nothing
    * (no two-sided fit to compare).
    *
    * Scale contract: per-key windows — series must be calendar-bucketed
    * (days/hours per key), never raw-event-sized; the aggregation
    * producing the series is the corpus-linear part and happens upstream.
    * Output: (key…, n, split_t, sse_total, sse_split, drop_frac) — one
    * row per key; drop_frac = 1 − sse_split/sse_total (null when
    * sse_total = 0).
    */
  def changepoint(
      df: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      valueCol: String,
      decimalScale: Int = 2
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty, "at least one key column is required")
    val keys = keyCols.map(col)
    val v = col(valueCol).cast(s"decimal(18,$decimalScale)")
    val wAll = Window.partitionBy(keys: _*)
    val wCum = wAll.orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.filter(col(timeCol).isNotNull && col(valueCol).isNotNull)
      .select(keys :+ col(timeCol).as("__t") :+ v.as("__v"): _*)
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__s", sum(col("__v")).over(wAll).cast("decimal(38,8)"))
      .withColumn("__ss",
        sum((col("__v") * col("__v")).cast("decimal(38,8)")).over(wAll))
      .withColumn("__nl", count(lit(1)).over(wCum))
      .withColumn("__sl", sum(col("__v")).over(wCum).cast("decimal(38,8)"))
      .withColumn("__ssl",
        sum((col("__v") * col("__v")).cast("decimal(38,8)")).over(wCum))
    def d(c: String) = col(c).cast("double")
    def sse(n: Column, s: Column, ss: Column): Column = ss - s * s / n
    val nr = (col("__n") - col("__nl")).cast("double")
    val cost = sse(d("__nl"), d("__sl"), d("__ssl")) +
      sse(nr, d("__s") - d("__sl"), d("__ss") - d("__ssl"))
    val candidates = base
      .filter(col("__n") >= 4 && col("__nl") >= 1 && col("__nl") < col("__n"))
      .withColumn("__cost", cost)
    val best = candidates
      .withColumn("__rn", row_number().over(
        wAll.orderBy(col("__cost"), col("__t"))))
      .filter(col("__rn") === 1)
    val q6 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 6)
    val sseTot = sse(d("__n"), d("__s"), d("__ss"))
    best.select(keys :+ col("__n").as("n") :+ col("__t").as("split_t")
      :+ q6(sseTot).as("sse_total") :+ q6(col("__cost")).as("sse_split")
      :+ when(sseTot > 0.0, q6(lit(1.0) - col("__cost") / sseTot))
        .as("drop_frac"): _*)
  }

  /** Additive seasonal-trend decomposition, the moving-average form (the
    * classical-decomposition core of STL without the loess robustness
    * passes): `value = trend + seasonal + remainder` with trend a
    * centered `period`-row mean, seasonal the per-phase mean of the
    * detrended series, remainder the rest. [[seasonalBaseline]] answers
    * "is today off its weekly rhythm"; this SPLITS the series so
    * downstream ops regress/alert on the deseasonalized component.
    *
    * Input contract: one row per (key, dayIdx) on a CONTIGUOUS integer
    * grid ([[resampleForwardFill]] upstream closes gaps) — the centered
    * window is row-based, so a gap would silently widen its time span.
    * Trend needs the full `period` rows (edges emit null trend/seasonal/
    * remainder). Phase = dayIdx mod period — engine-exact integers.
    * Per-phase means sum 1e-6-quantized detrended values as decimal (the
    * anova term discipline), so the decomposition is order-independent.
    *
    * Shape: one per-key centered window, one phase-keyed aggregation
    * (|keys|·period rows) broadcast back. Output: (key…, dayIdx, value,
    * trend, seasonal, remainder).
    */
  def stlDecompose(
      df: DataFrame,
      keyCols: Seq[String],
      dayCol: String,
      valueCol: String,
      period: Int = 7,
      decimalScale: Int = 2
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty, "at least one key column is required")
    require(period >= 2 && period % 2 == 1,
      s"period must be odd >= 3 for a centered row window, got $period")
    val keys = keyCols.map(col)
    val half = period / 2
    val q6 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 6)
    val centered = Window.partitionBy(keys: _*).orderBy(col("__day"))
      .rowsBetween(-half, half)
    val base = df.filter(col(dayCol).isNotNull && col(valueCol).isNotNull)
      .select(keys :+ col(dayCol).cast("long").as("__day")
        :+ col(valueCol).cast(s"decimal(18,$decimalScale)").as("__v"): _*)
      .withColumn("__w", count(lit(1)).over(centered))
      .withColumn("__sum", sum(col("__v")).over(centered).cast("decimal(38,8)"))
      .withColumn("__trend",
        when(col("__w") === period,
          q6(col("__sum").cast("double") / lit(period.toDouble))))
      .withColumn("__detr",
        q6(col("__v").cast("double") - col("__trend")))
      .withColumn("__phase", pmod(col("__day"), lit(period.toLong)))
    val seasonal = base.filter(col("__trend").isNotNull)
      .groupBy(keys :+ col("__phase"): _*)
      .agg((sum(col("__detr").cast("decimal(18,6)")).cast("double") /
        count(lit(1)).cast("double")).as("__smean"))
      .select(keys :+ col("__phase") :+ q6(col("__smean")).as("__seasonal"): _*)
    base.join(broadcast(seasonal), keyCols :+ "__phase", "left")
      .select(keys :+ col("__day").as(dayCol) :+ col("__v").cast("double").as("value")
        :+ col("__trend").as("trend")
        :+ when(col("__trend").isNotNull, col("__seasonal")).as("seasonal")
        :+ when(col("__trend").isNotNull,
          q6(col("__detr") - col("__seasonal"))).as("remainder"): _*)
  }
  /** Seasonal-naive forecast BACKTEST card — the "is this series even
    * forecastable, and does seasonality help" readout (Hyndman &
    * Koehler 2006's MASE) that gates whether a capacity-planning or
    * anomaly-baseline model is worth fitting at all. Per key, the LAST
    * `horizon` points (by `tCol`) form the test window; the forecast
    * for test point t is the actual at t − `period` (seasonal naive);
    * the MASE scale is the mean one-step naive error over the TRAIN
    * window. `horizon <= period` is REQUIRED so every forecast source
    * lies in train (no test leakage), and keys with fewer than
    * `period + horizon + 1` points drop (scale needs >= period train
    * intervals).
    *
    * Engine-exactness: `valCol` is cast to long (integral-series
    * contract — the daily-count series the q242/q243/q250 family runs
    * on; the rfm integral-monetary precedent), so every error term and
    * both sums are exact; `mase = (Σerr · n_scale) / (Σscale · n_test)`
    * is ONE division of two exact long products, rounded at 6. Scale
    * shape: two keyed window passes + one |keys|-row aggregation — a
    * single shuffle on the key at any corpus size. */
  def forecastBacktest(
      df: DataFrame,
      keyCols: Seq[String],
      tCol: String,
      valCol: String,
      period: Int,
      horizon: Int): DataFrame = {
    require(period >= 1 && horizon >= 1 && horizon <= period,
      s"horizon must be in [1, period] so every seasonal-naive source is in train: " +
        s"period=$period horizon=$horizon")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(tCol))
    val wAll = Window.partitionBy(keys: _*)
    val base = df
      .select(keys :+ col(tCol) :+ col(valCol).cast("long").as("__v"): _*)
      .withColumn("__idx", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__prev", lag(col("__v"), 1).over(w))
      .withColumn("__src", lag(col("__v"), period).over(w))
    val isTest = col("__idx") > col("__n") - horizon
    base
      .filter(col("__n") >= period + horizon + 1)
      .groupBy(keys: _*)
      .agg(
        max(col("__n") - horizon).as("n_train"),
        sum(when(isTest, lit(1L)).otherwise(lit(0L))).as("n_test"),
        sum(when(isTest, abs(col("__v") - col("__src")))).as("__sum_err"),
        sum(when(!isTest && col("__idx") >= 2,
          abs(col("__v") - col("__prev")))).as("__sum_scale"))
      .select(keys :+ col("n_train") :+ col("n_test")
        :+ round(col("__sum_err").cast("double") / col("n_test").cast("double"), 6)
          .as("mae")
        // degenerate-scale guard: a constant train window (all one-step
        // diffs zero) has no naive error to scale by — emit null, never
        // Infinity/NaN (engines disagree on double x/0; r15 ADVICE)
        :+ when(col("__sum_scale") > 0L,
            round((col("__sum_err") * (col("n_train") - 1L)).cast("double")
              / (col("__sum_scale") * col("n_test")).cast("double"), 6)).as("mase"): _*)
  }
}
