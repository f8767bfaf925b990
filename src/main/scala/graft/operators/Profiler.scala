package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality card a corpus catalog keeps per
  * column: row/null counts, min/max, and an HLL distinct-count estimate.
  * The ingestion-side sibling of [[graft.operators.TextAnalysis.corpusStats]]:
  * run it on every landed table and diff cards across vintages to catch
  * schema drift, null storms, and cardinality explosions before a 100 TB
  * job does.
  *
  * Shape: ONE unpivot scan (|cols| string-cast rows per input row) feeding
  * two keyed aggregations — null/min/max counts, and the
  * [[Sketches.hllRegisters]] chain keyed by column name — so per-column
  * state is O(m) registers regardless of cardinality (a
  * `count(DISTINCT)` per column would shuffle every distinct value; the
  * sketch keeps the profile one bounded pass). The |cols|-row results
  * join at the end (parameter-sized by construction).
  *
  * min/max compare the STRING form of every value (profile-grade
  * lexicographic ordering, identical bytes-compare in any engine —
  * documented: "100" < "99" as strings). Null values are excluded from
  * the sketch and from min/max, counted in `n_nulls`.
  *
  * (The reference has no profiling — training-data-pipeline surface,
  * SURVEY.md §2.3.)
  */
object Profiler {

  def profileColumns(
      df: DataFrame,
      cols: Seq[String],
      p: Int = 6,
      salt: String = "prof"
  ): DataFrame = {
    require(cols.nonEmpty, "at least one column is required")
    val asStrings = df.select(cols.map(c => col(c).cast("string").as(c)): _*)
    val unpivoted = asStrings.unpivot(
      Array.empty, cols.map(col).toArray, "column", "value")
    val basic = unpivoted
      .groupBy(col("column"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_nulls"),
        min(col("value")).as("min_str"),
        max(col("value")).as("max_str"))
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(
        unpivoted.filter(col("value").isNotNull), Seq("column"), col("value"), p, salt),
      Seq("column"), p)
    basic
      .join(est, Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_nulls"),
        col("min_str"), col("max_str"),
        round(col("hll_est"), 4).as("distinct_est"), col("zero_regs"))
  }

  /** Fixed-bin histogram of an integral column per group — the value-
    * distribution half of the data card (the per-column card above gives
    * cardinality; this gives shape, the artifact that catches a
    * length-distribution drift between corpus vintages). Bin edges come
    * from literal `[minV, maxV]` with `bins` equal-width buckets, the
    * [[graft.sinks.ClusteredWrite.zBucket]] integer arithmetic (exact in
    * every engine; values outside the domain clamp to the end bins, so a
    * drifted vintage shows up as fat edge bins, not an error). ONE
    * map-side-combined aggregation; output is groups × bins rows.
    */
  def histogram(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      minV: Long,
      maxV: Long,
      bins: Int
  ): DataFrame = {
    require(bins > 0 && (bins & (bins - 1)) == 0 && bins <= (1 << 20),
      s"bins must be a power of two in (0, 2^20], got $bins")
    val bits = java.lang.Integer.numberOfTrailingZeros(bins)
    val clamped = greatest(lit(minV), least(lit(maxV), col(valueCol).cast("long")))
    val bucket = graft.sinks.ClusteredWrite.zBucket(clamped, minV, maxV, bits)
    df.groupBy(groupCols.map(col) :+ bucket.as("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Pearson correlation per group from EXACT decimal sufficient
    * statistics: n, Σx, Σy, Σxy, Σx², Σy² accumulated as decimals (the
    * dsum convention — inputs quantized to the column's true decimal
    * scale first, so every sum is order-independent and bit-exact under
    * any sharding), the closed-form r computed in doubles only at the
    * end. A float-sum corr (Spark's `corr`) is summation-order-sensitive
    * AND suffers catastrophic cancellation in n·Σxy − Σx·Σy — the exact
    * sums make the statistic deterministic and engine-reproducible.
    * Output: (groups…, n, r) with r scaled-floor quantized to 6; null
    * when either variance term is 0.
    */
  def pearsonByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String,
      decimalScale: Int = 2
  ): DataFrame =
    pearsonFromComoments(
      comomentPartial(df, groupCols, xCol, yCol, decimalScale), groupCols)

  /** MERGEABLE comoment partial for [[pearsonByGroup]] — the two-column
    * sibling of [[Inference.momentPartial]]: one shard's exact
    * (keys…, n, sx, sy, sxy, sxx, syy), inputs decimal-cast at
    * `decimalScale`, every sum decimal(38,8) — associative and
    * commutative bit-exactly, so [[comomentMerge]] over any sharding
    * (daily vintages, backfills) equals the from-scratch statistics.
    * Pairwise-complete rows only: sum() skips nulls but count(*)
    * doesn't, so a nullable column would silently corrupt r (n over all
    * rows, Σ over fewer — the r10 self-review finding). */
  def comomentPartial(
      df: DataFrame,
      keys: Seq[String],
      xCol: String,
      yCol: String,
      decimalScale: Int = 2
  ): DataFrame = {
    require(keys.nonEmpty, "at least one key column is required")
    val x = col(xCol).cast(s"decimal(18,$decimalScale)")
    val y = col(yCol).cast(s"decimal(18,$decimalScale)")
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x).cast("decimal(38,8)").as("sx"),
        sum(y).cast("decimal(38,8)").as("sy"),
        sum((x * y).cast("decimal(38,8)")).as("sxy"),
        sum((x * x).cast("decimal(38,8)")).as("sxx"),
        sum((y * y).cast("decimal(38,8)")).as("syy"))
  }

  /** Merge [[comomentPartial]] tables over the same keys — one keyed
    * aggregation, associative bit for bit. */
  def comomentMerge(partials: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(partials.nonEmpty, "at least one partial table is required")
    val cols = Seq("n", "sx", "sy", "sxy", "sxx", "syy")
    partials.foreach { p =>
      require(cols.forall(p.columns.contains),
        s"not a comoment-partial table: ${p.columns.mkString(", ")}")
    }
    partials.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sx")).cast("decimal(38,8)").as("sx"),
        sum(col("sy")).cast("decimal(38,8)").as("sy"),
        sum(col("sxy")).cast("decimal(38,8)").as("sxy"),
        sum(col("sxx")).cast("decimal(38,8)").as("sxx"),
        sum(col("syy")).cast("decimal(38,8)").as("syy"))
  }

  /** [[pearsonByGroup]]'s closed form off a comoments frame — identical
    * output and bit-identical values whether the frame came from one
    * shard or a [[comomentMerge]] of many. */
  def pearsonFromComoments(comoments: DataFrame, groupCols: Seq[String]): DataFrame = {
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val vx = nD * d("sxx") - d("sx") * d("sx")
    val vy = nD * d("syy") - d("sy") * d("sy")
    val num = nD * d("sxy") - d("sx") * d("sy")
    comoments.select(groupCols.map(col) :+ col("n") :+
      when(vx > 0.0 && vy > 0.0,
        graft.functions.Quantize.scaledFloor(num / sqrt(vx * vy), 6))
        .as("r"): _*)
  }

  /** Benford first-digit audit: observed vs expected leading-digit
    * distribution of a positive numeric column — the classic
    * fabricated-data / unit-mixup / truncation-bug detector for
    * financial-style magnitudes (organic multi-scale data follows
    * log10(1 + 1/d); capped, generated, or copy-pasted columns don't).
    *
    * Values are floored to integers FIRST (explicitly — Spark's
    * double→long cast truncates while other engines round, so the floor
    * is part of the contract), the leading digit read from the integer's
    * decimal form (engine-identical formatting), rows < 1 excluded.
    * One map-side-combined count aggregation; output is 9 rows with
    * observed/expected fractions (scaled-floor quantized).
    */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    val digits = df
      .filter(col(valueCol) >= 1)
      .select(substring(floor(col(valueCol)).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("cnt"))
    val total = digits.agg(sum(col("cnt")).cast("double").as("__n"))
    def q6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      graft.functions.Quantize.scaledFloor(c, 6)
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("cnt"),
        q6(col("cnt") / col("__n")).as("obs_frac"),
        q6(log10(lit(1.0) + lit(1.0) / col("digit"))).as("exp_frac"))
  }

  /** Quantile estimates from a [[histogram]] frame — the MERGEABLE
    * approximate-quantile path: per-shard histograms are integer count
    * vectors that merge by addition (bit-exact, any grouping), so a
    * metrics store keeps one bins-sized vector per vintage and serves
    * p50/p90/p99 forever without rescanning data. Error is bounded by the
    * bin width (D/bins) — the honest, parameter-visible trade a
    * deterministic pipeline wants over rank-error sketches whose merge
    * order shows up in the estimate.
    *
    * Estimate: linear interpolation inside the first bin whose cumulative
    * count reaches q·N — `est = minV + (bin + (qN − cumBefore)/cnt) · D/bins`
    * with D = maxV−minV+1. The per-group scan is a window over BIN rows
    * (parameter-bounded, never corpus rows). Quantiles must be in (0, 1].
    */
  def histogramQuantiles(
      hist: DataFrame,
      groupCols: Seq[String],
      minV: Long,
      maxV: Long,
      bins: Int,
      quantiles: Seq[Double]
  ): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val d = maxV - minV + 1L
    val wCum = Window.partitionBy(groupCols.map(col): _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val cum = hist
      .withColumn("__cum", sum(col("cnt")).over(wCum))
      .withColumn("__n", sum(col("cnt")).over(wAll))
      .withColumn("__before", col("__cum") - col("cnt"))
    cum
      .crossJoin(broadcast(
        hist.sparkSession.range(1).select(explode(array(quantiles.map(lit): _*)).as("q"))))
      .withColumn("__target", col("q") * col("__n"))
      .filter(col("__cum") >= col("__target") && col("__before") < col("__target"))
      .select(groupCols.map(col) :+ col("q") :+
        graft.functions.Quantize.scaledFloor(lit(minV) +
          (col("bin") + (col("__target") - col("__before")) / col("cnt")) *
            (lit(d).cast("double") / lit(bins)), 4).as("est"): _*)
  }

  /** Data-contract battery (the expectation-suite pattern): each rule is
    * (column, kind, bound) with kind one of `min_ge` / `max_le`
    * (numeric columns), `null_frac_le`, `distinct_ge` / `distinct_le`
    * (any column); the report carries the OBSERVED value next to the
    * bound and a pass flag per rule — the landing-zone gate a pipeline
    * checks before admitting a vintage downstream (run it, fail the run
    * on `pass = false` rows, keep the report as the audit artifact).
    *
    * Shape: ONE map-side-combined scalar aggregation computes every
    * min/max/null/total in a single corpus pass; each `distinct_*`
    * column adds one count-distinct aggregation (exact by contract —
    * this is an audit, the cost is the product; the KMV sketch family
    * is the estimate path when exactness isn't owed). Output is
    * rules-sized. Observed values are doubles on the 1e-6 grid
    * (min/max/null-frac) or exact long counts surfaced as doubles
    * (distinct), so a SQL oracle reproduces the report bit for bit.
    */
  def expectationReport(
      df: DataFrame,
      rules: Seq[(String, String, Double)]
  ): DataFrame = {
    require(rules.nonEmpty, "at least one expectation is required")
    val kinds = Set("min_ge", "max_le", "null_frac_le", "distinct_ge", "distinct_le")
    rules.foreach { case (c, k, _) =>
      require(kinds.contains(k), s"unknown expectation kind '$k' for column $c")
      require(df.columns.contains(c), s"no such column: $c")
    }
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    val q6 = (c: org.apache.spark.sql.Column) =>
      graft.functions.Quantize.scaledFloor(c, 6)
    val scalarCols = rules.collect {
      case (c, "min_ge", _) => q6(min(col(c).cast("double"))).as(s"__min_$c")
      case (c, "max_le", _) => q6(max(col(c).cast("double"))).as(s"__max_$c")
      case (c, "null_frac_le", _) =>
        q6(count(when(col(c).isNull, 1)).cast("double") /
          count(lit(1)).cast("double")).as(s"__nf_$c")
      case (c, k, _) if k.startsWith("distinct") =>
        countDistinct(col(c)).cast("double").as(s"__nd_$c")
    }.distinct
    val obs = df.agg(scalarCols.head, scalarCols.tail: _*).collect().head
    def observedOf(name: String): Option[Double] = {
      val i = obs.fieldIndex(name)
      if (obs.isNullAt(i)) None else Some(obs.getDouble(i))
    }
    val out = rules.map { case (c, k, bound) =>
      val observed = k match {
        case "min_ge" => observedOf(s"__min_$c")
        case "max_le" => observedOf(s"__max_$c")
        case "null_frac_le" => observedOf(s"__nf_$c")
        case _ => observedOf(s"__nd_$c")
      }
      Row(c, k, bound, observed.map(Double.box).orNull,
        expectationPass(k, observed, bound))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), expectationSchema)
  }

  /** The expectation-report output schema — shared with the streaming
    * monitor ([[graft.streaming.StreamingExpectations.report]]) so the
    * drain≡batch contract is structural, not parallel-maintained. */
  private[graft] val expectationSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("col_name",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("kind",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("bound",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("observed",
        org.apache.spark.sql.types.DoubleType, nullable = true),
      org.apache.spark.sql.types.StructField("pass",
        org.apache.spark.sql.types.BooleanType, nullable = false)))

  /** The shared pass rule for expectation kinds: an absent observation
    * (nothing arrived / all null) FAILS CLOSED — a range bound over no
    * values certifies nothing. */
  private[graft] def expectationPass(
      kind: String, observed: Option[Double], bound: Double): Boolean =
    (kind, observed) match {
      case (_, None) => false
      case ("min_ge", Some(o)) => o >= bound
      case ("max_le", Some(o)) => o <= bound
      case ("null_frac_le", Some(o)) => o <= bound
      case ("distinct_ge", Some(o)) => o >= bound
      case (_, Some(o)) => o <= bound
    }

  /** Hill tail-index estimator — "how heavy is the tail": for the top
    * k+1 order statistics X₁ ≥ … ≥ X_{k+1} of a positive column,
    * `H = (1/k)·Σ_{i≤k} (ln Xᵢ − ln X_{k+1})` estimates 1/α of a
    * power-law tail P(X > x) ~ x^{−α} (Hill 1975). Corpus work leans on
    * it constantly: document/line lengths, degree distributions and
    * duplicate-cluster sizes are heavy-tailed, and α decides whether
    * mean-based budgets (token caps, per-key caps) are even meaningful
    * (α ≤ 1: the mean diverges; α ≤ 2: the variance does).
    *
    * Shape: ONE TakeOrdered of k+1 rows (O(k) heaps per partition,
    * never a global sort) + a scalar aggregation over them. Ties at the
    * k+1 boundary are harmless — equal values swap without changing the
    * multiset. Per-term ln quantizes to the 1e-7 integer grid before
    * the exact long sum (the q172 convention), so any SQL engine
    * reproduces the row. Output 1 row: (n_tail = k, x_tail_min =
    * X_{k+1}, hill = H, alpha = 1/H), hill/alpha scaled-floor quantized;
    * alpha is null when H quantizes to 0 (a degenerate constant tail).
    * Requires at least k+1 positive values (loud otherwise). */
  def hillTailIndex(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val q6 = (c: org.apache.spark.sql.Column) =>
      graft.functions.Quantize.scaledFloor(c, 6)
    val top = df.select(col(valueCol).cast("double").as("__x"))
      // finite positives only: Spark orders NaN above every double and
      // +Inf above every finite one, so `> 0` alone would admit both to
      // the top of the desc order and silently garbage the quantized ln
      // sum (floor(NaN·1e7).cast(long) is 0, Inf saturates) — ln is
      // undefined there, exclusion is the contract; the k+1 count check
      // below still fails loudly if too few finite positives remain
      .filter(col("__x") > 0.0 && !isnan(col("__x")) &&
        col("__x") =!= Double.PositiveInfinity)
      .orderBy(col("__x").desc)
      .limit(k + 1)
    val agg = top.agg(count(lit(1)).as("__c"),
      sum(floor(log(col("__x")) * lit(1.0e7) + lit(0.5)).cast("long")).as("__sl7"),
      min(col("__x")).as("x_tail_min"))
    val lnMin7 = floor(log(col("x_tail_min")) * lit(1.0e7) + lit(0.5)).cast("long")
    val hillRaw = (col("__sl7") - col("__c") * lnMin7).cast("double") / 1.0e7 /
      lit(k.toDouble)
    agg.select(
      when(col("__c") === (k + 1).toLong, lit(k.toLong))
        .otherwise(raise_error(concat(lit(s"hillTailIndex: need ${k + 1} positive values, got "),
          col("__c").cast("string")))).as("n_tail"),
      col("x_tail_min"),
      q6(hillRaw).as("hill"),
      when(q6(hillRaw) > 0.0, q6(lit(1.0) / q6(hillRaw))).as("alpha"))
  }

  /** Functional-dependency audit: does `X → Y` hold? Returns the X values
    * that map to MORE than one distinct Y (the violations), with the
    * count — constraint MINING for profile cards ("source determines
    * lang?") and regression detection for constraints a pipeline assumes.
    * One distinct + one count aggregation, both map-side combined; output
    * is bounded by the violating-X count. An empty result certifies the
    * dependency on this vintage.
    */
  def fdViolations(df: DataFrame, xCols: Seq[String], yCols: Seq[String]): DataFrame = {
    require(xCols.nonEmpty && yCols.nonEmpty, "X and Y column sets must be non-empty")
    df.select((xCols ++ yCols).map(col): _*).distinct()
      .groupBy(xCols.map(col): _*)
      .agg(count(lit(1)).as("distinct_y"))
      .filter(col("distinct_y") > 1)
  }

  /** Shannon entropy (nats) of each listed ENUM-like column's value
    * distribution — the concentration card: 0 = constant column, ln(k) =
    * uniform over k values. Counts are exact integers; the −Σ p·ln p fold
    * runs over the value-count rows (enum-sized by the caller's contract)
    * and rounds to 6. Nulls count as a value. */
  def entropyCard(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column is required")
    val unpivoted = df.select(cols.map(c => col(c).cast("string").as(c)): _*)
      .unpivot(Array.empty, cols.map(col).toArray, "column", "value")
    val counts = unpivoted.groupBy(col("column"), col("value")).agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy(col("column")).agg(sum(col("__c")).cast("double").as("__t"),
      count(lit(1)).as("n_values"))
    counts.join(totals.hint("shuffle_merge"), Seq("column"))
      .groupBy(col("column"), col("n_values"))
      .agg(round(-sum((col("__c") / col("__t")) * log(col("__c") / col("__t"))), 6)
        .as("entropy_nats"))
      .select(col("column"), col("n_values"), col("entropy_nats"))
  }

  /** Referential-integrity audit: fact keys with no matching dimension
    * key (FK orphans) — ONE SMJ-pinned anti-join, orphan keys + row
    * counts out. An empty result certifies the constraint. */
  def riOrphans(
      fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String): DataFrame =
    fact.select(col(factKey))
      .join(dim.select(col(dimKey).as(factKey)).distinct().hint("shuffle_merge"),
        Seq(factKey), "left_anti")
      .groupBy(col(factKey)).agg(count(lit(1)).as("orphan_rows"))

  /** Declarative data-quality gate — the expectation-suite pattern: each
    * check is a named AGGREGATE boolean over the frame ("row count ≥ N",
    * "null rate of c = 0", "min(v) > 0"), all evaluated in ONE single-row
    * aggregation and unpivoted to (check, passed) rows — a vintage either
    * passes its suite or the report names what broke, before a 100 TB job
    * consumes it. Compose with [[profileColumns]]/[[histogram]] for the
    * metric side of the card.
    */
  def expect(df: DataFrame, checks: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one check is required")
    require(checks.map(_._1).distinct.length == checks.length, "check names must be unique")
    val aggs = checks.map { case (name, c) => c.cast("boolean").as(name) }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(checks.map { case (name, _) =>
        struct(lit(name).as("check"), coalesce(col(name), lit(false)).as("passed"))
      }: _*)).as("__e"))
      .select(col("__e.*"))
  }

  /** Total-variation distance between two corpora's value distributions
    * over a shared fixed-bin [[histogram]] domain — the vintage-drift
    * number: 0 = identical shape, 1 = disjoint. `0.5 · Σ_bins |p_A − p_B|`
    * with each p an exact integer-count ratio; two bounded aggregations +
    * one bins-sized merge, rounded to 6. */
  def histogramDrift(
      dfA: DataFrame,
      dfB: DataFrame,
      valueCol: String,
      minV: Long,
      maxV: Long,
      bins: Int
  ): DataFrame = {
    def side(df: DataFrame, cnt: String) =
      histogram(df.select(col(valueCol)), valueCol, Seq.empty, minV, maxV, bins)
        .withColumnRenamed("cnt", cnt)
    val a = side(dfA, "__ca")
    val b = side(dfB, "__cb")
    val merged = a.join(b, Seq("bin"), "full_outer")
      .select(coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val totals = merged.agg(sum(col("__ca")).cast("double").as("__ta"),
      sum(col("__cb")).cast("double").as("__tb"))
    merged.crossJoin(broadcast(totals))
      .agg(round(sum(abs(col("__ca") / col("__ta") - col("__cb") / col("__tb"))) / 2.0, 6)
        .as("tv_distance"))
  }

  /** Profile drift between two table vintages — the data-contract check a
    * nightly pipeline runs before pointing training at a new snapshot:
    * [[profileColumns]] over both frames joined per column, emitting the
    * presence/shape deltas that catch silent upstream changes (a column
    * gone, a null-rate spike, a cardinality collapse — each a class of
    * incident the per-run eyeball misses). `status` is added/removed/
    * common; numeric drifts are exact-integer differences plus the
    * null-FRACTION delta (scaled-floor quantized); `distinct_ratio` is
    * new-estimate/old-estimate (HLL is hash-deterministic, so the ratio
    * is engine-exact), null when the old estimate is 0.
    *
    * Shape: two profile passes (each one unpivot + counting aggregation +
    * HLL, column-bounded output) and one |cols|-row full-outer join.
    */
  def profileDrift(
      dfOld: DataFrame,
      dfNew: DataFrame,
      colsOld: Seq[String],
      colsNew: Seq[String],
      p: Int = 6,
      salt: String = "prof"
  ): DataFrame = {
    def side(df: DataFrame, cols: Seq[String], pre: String) =
      profileColumns(df, cols, p, salt).select(
        col("column"),
        col("n_rows").as(s"${pre}_rows"),
        col("n_nulls").as(s"${pre}_nulls"),
        col("distinct_est").as(s"${pre}_distinct"))
    side(dfOld, colsOld, "old")
      .join(side(dfNew, colsNew, "new"), Seq("column"), "full_outer")
      .select(col("column"),
        when(col("old_rows").isNull, lit("added"))
          .when(col("new_rows").isNull, lit("removed"))
          .otherwise(lit("common")).as("status"),
        col("old_rows"), col("new_rows"),
        graft.functions.Quantize.scaledFloor(
          coalesce(col("new_nulls").cast("double") / col("new_rows").cast("double"), lit(0.0)) -
            coalesce(col("old_nulls").cast("double") / col("old_rows").cast("double"), lit(0.0)),
          6).as("null_frac_delta"),
        when(col("old_distinct") > 0,
          graft.functions.Quantize.scaledFloor(
            col("new_distinct") / col("old_distinct"), 6)).as("distinct_ratio"))
  }

  /** Population Stability Index between two vintages of a bounded
    * integral column — the industry-standard drift score risk teams gate
    * on (rule of thumb: < 0.1 stable, 0.1–0.25 moderate, > 0.25 major
    * shift): both frames histogram onto the SAME literal
    * [minV, maxV]/bins grid ([[histogram]]'s clamp-to-edge arithmetic),
    * counts are add-one smoothed (an empty bin on one side must not blow
    * up the log), and `PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b)`. The
    * logarithmic tail-weighting is what [[histogramDrift]]'s TV distance
    * deliberately lacks — TV answers "how much mass moved", PSI answers
    * "how alarmed should the scorecard be".
    *
    * Per-bin contributions quantize to the 1e-7 integer grid before the
    * sum (order-free; `ln` ulps against grid boundaries are the accepted
    * q172 class). Two counting aggregations + a bins-bounded join; one
    * summary row (psi). */
  def psi(
      dfA: DataFrame,
      dfB: DataFrame,
      valueCol: String,
      minV: Long,
      maxV: Long,
      bins: Int
  ): DataFrame = {
    def side(df: DataFrame, cnt: String) =
      histogram(df.select(col(valueCol)), valueCol, Seq.empty, minV, maxV, bins)
        .withColumnRenamed("cnt", cnt)
    psiFromBinCounts(
      side(dfA, "__ca").join(side(dfB, "__cb"), Seq("bin"), "full_outer"), bins)
  }

  /** [[psi]]'s finishing expressions off a per-bin (__ca, __cb) counts
    * frame (either side nullable from the full-outer bin merge) — shared
    * by the batch test and the streaming drift monitor
    * ([[graft.streaming.StreamingDrift.psiVsReference]]): bin counts are
    * plain longs (associative under any shard merge), so a drained
    * stream's merged snapshots produce a BIT-IDENTICAL psi to the batch
    * operator over the same rows. */
  def psiFromBinCounts(binCounts: DataFrame, bins: Int): DataFrame = {
    val merged = binCounts
      .select(coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val totals = merged.agg(sum(col("__ca")).as("__ta"), sum(col("__cb")).as("__tb"))
    merged.crossJoin(broadcast(totals))
      .select(
        ((col("__ca") + lit(1L)).cast("double") /
          (col("__ta") + lit(bins.toLong)).cast("double")).as("__pa"),
        ((col("__cb") + lit(1L)).cast("double") /
          (col("__tb") + lit(bins.toLong)).cast("double")).as("__pb"))
      .select(floor((col("__pa") - col("__pb")) * log(col("__pa") / col("__pb"))
        * lit(1.0e7) + lit(0.5)).cast("long").as("__c7"))
      .agg(graft.functions.Quantize.scaledFloor(
        sum(col("__c7")).cast("double") / 1.0e7, 6).as("psi"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) between two vintages of a
    * numeric column — the NONPARAMETRIC drift significance test (PSI/TV
    * say how much the histogram moved; U says whether one vintage
    * stochastically dominates, robust to outliers and shape): midranks
    * over the combined sample with the standard tie correction,
    * `U_A = R_A − n_A(n_A+1)/2`, and the normal-approximation z.
    *
    * Every rank quantity accumulates EXACTLY at ANY scale: doubled
    * midranks (2·mid = 2·before + t + 1) are longs, the rank sum and
    * the tie term t³−t accumulate as decimal(38,0) — order-free with no
    * 2^53 double ceiling. The final halving and z run in double off
    * those exact decimals, so past n_a·n_b ≈ 9·10^15 pairs the
    * decimal→double cast itself rounds (relative error ≤ 2^-53) before
    * the halving — u_a is exact-to-the-ulp, not bit-exact, at that
    * extreme; z's quantized output is unaffected. Shape: one
    * per-value counting aggregation, one value-ordered window over the
    * DISTINCT-value frame (value-cardinality-sized, not corpus-sized),
    * two scalar aggregates. Output: (n_a, n_b, u_a, z) with z
    * scaled-floor quantized; z is null when every value ties (σ = 0).
    */
  def mannWhitney(
      dfA: DataFrame,
      dfB: DataFrame,
      valueCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = dfA.select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("__na"))
      .join(dfB.select(col(valueCol).cast("double").as("__v"))
        .filter(col("__v").isNotNull)
        .groupBy(col("__v")).agg(count(lit(1)).as("__nb")), Seq("__v"), "full_outer")
      .select(col("__v"), coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
    // UNPARTITIONED-WINDOW: distinct-value frame, WindowGuard-ed
    val w = Window.orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = counts
      .withColumn("__t", col("__na") + col("__nb"))
      .withColumn("__before", WindowGuard.guarded(
        coalesce(sum(col("__t")).over(w), lit(0L)),
        Seq(col("__v")), "mannWhitney"))
      // doubled midrank 2·mid = 2·before + t + 1 is an exact LONG — the
      // na·mid rank sum then accumulates as decimal(38,0), order-free at
      // ANY n (a double sum of na·mid loses exactness past na·mid ≈ 2^53)
      .withColumn("__mid2", lit(2L) * col("__before") + col("__t") + lit(1L))
    ranked.agg(
      sum(col("__na")).as("__sa"),
      sum(col("__nb")).as("__sb"),
      sum(col("__na").cast("decimal(19,0)") * col("__mid2").cast("decimal(19,0)"))
        .as("__ra2"),
      // t³−t as exact decimal: 12+12+12 digits keeps the product at
      // precision 38 with no silent scale drop, and the sum stays
      // order-free at any tie multiplicity (a double sum loses exactness
      // past t ≈ 2^18 — the advice-r11 ceiling)
      sum(col("__t").cast("decimal(12,0)") * col("__t").cast("decimal(12,0)")
        * col("__t").cast("decimal(12,0)")
        - col("__t").cast("decimal(12,0)")).as("__ties"))
      .select(col("__sa").as("n_a"), col("__sb").as("n_b"),
        // U_A = (2R_A − n_A(n_A+1)) / 2 — numerator exact in decimal; the
        // decimal→double cast before the halving rounds past 2^53
        ((col("__ra2") - col("__sa").cast("decimal(18,0)")
          * (col("__sa") + lit(1L)).cast("decimal(18,0)")).cast("double") / 2.0)
          .as("u_a"),
        col("__ties"))
      .select(col("n_a"), col("n_b"), col("u_a"),
        {
          val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
          val n = na + nb
          val mu = na * nb / 2.0
          val sigma2 =
            na * nb / 12.0 * ((n + 1.0) - col("__ties").cast("double") / (n * (n - 1.0)))
          when(sigma2 > 0.0, graft.functions.Quantize.scaledFloor(
            (col("u_a") - mu) / sqrt(sigma2), 6)).as("z")
        })
  }

  /** Gini concentration of a grouped count distribution — the corpus-
    * dominance card ("5 domains supply 80 % of documents"): counts per
    * group sorted ascending (ties broken by group for a deterministic
    * rank — the sum is tie-order-invariant anyway, since equal counts
    * contribute `x·Σi` whatever the permutation),
    * `G = 2·Σ i·x_i / (n·Σx) − (n+1)/n`. Integer sums throughout
    * (Σ i·x_i as longs — order-free); the two-term double expression at
    * the end is exact-input division, scaled-floor quantized. One keyed
    * count, one group-count-sized window, one scalar aggregate. Output:
    * (n_groups, total, gini). */
  def giniConcentration(
      df: DataFrame,
      groupCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__x"))
    // UNPARTITIONED-WINDOW: group-cardinality frame, WindowGuard-ed
    val w = Window.orderBy(col("__x"), col(groupCol))
    counts
      .withColumn("__i", WindowGuard.guarded(
        row_number().over(w).cast("long"),
        Seq(col("__x"), col(groupCol)), "giniConcentration"))
      .agg(count(lit(1)).as("n_groups"), sum(col("__x")).as("total"),
        sum(col("__i") * col("__x")).as("__ix"))
      .select(col("n_groups"), col("total"),
        graft.functions.Quantize.scaledFloor(
          lit(2.0) * col("__ix").cast("double") /
            (col("n_groups").cast("double") * col("total").cast("double")) -
            (col("n_groups") + 1L).cast("double") / col("n_groups").cast("double"), 6)
          .as("gini"))
  }

  /** Cohen's κ inter-rater agreement per group — the label-QA statistic
    * for training-data annotation (two labelers, or a heuristic labeler
    * vs recorded metadata): `κ = (p_o − p_e)/(1 − p_e)` with `p_o` the
    * observed agreement rate and `p_e = Σ_c p_A(c)·p_B(c)` the
    * chance-agreement rate from the raters' marginals. Raw agreement
    * overstates quality whenever the label distribution is skewed; κ is
    * the standard correction (Cohen 1960).
    *
    * Integer counts to the last ratio (exact-double divisions, quantized
    * through scaledFloor), so the statistic is engine-exact. Rows where
    * either rater is null are EXCLUDED (no rating ≠ a rating of "null").
    * κ is null when `p_e = 1` (both raters constant — chance explains
    * everything, the statistic is undefined). Marginal products sum as
    * longs: fine to ~3·10⁹ ratings per class per group, the documented
    * bound.
    *
    * Shape: three keyed counting aggregations (total/agree; per-class
    * marginals ×2) + one class-keyed join, all map-side combined;
    * output is group-bounded. Output: (groupCols…, n, po, pe, kappa).
    */
  def cohenKappa(
      df: DataFrame,
      raterACol: String,
      raterBCol: String,
      groupCols: Seq[String] = Nil
  ): DataFrame = {
    val g = groupCols.map(col)
    val base = df
      .filter(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .select(g ++ Seq(col(raterACol).cast("string").as("__a"),
        col(raterBCol).cast("string").as("__b")): _*)
    val tot = base.groupBy(g: _*)
      .agg(count(lit(1)).as("__n"),
        count(when(col("__a") === col("__b"), 1)).as("__agree"))
    val ca = base.groupBy(g :+ col("__a").as("__cls"): _*).agg(count(lit(1)).as("__ca"))
    val cb = base.groupBy(g :+ col("__b").as("__cls"): _*).agg(count(lit(1)).as("__cb"))
    val pe = ca.join(cb, groupCols :+ "__cls")
      .groupBy(g: _*).agg(sum(col("__ca") * col("__cb")).as("__pn"))
    val poR = col("__agree").cast("double") / col("__n").cast("double")
    val peR = coalesce(col("__pn"), lit(0L)).cast("double") /
      (col("__n").cast("double") * col("__n").cast("double"))
    val joined =
      if (groupCols.isEmpty) tot.crossJoin(pe)
      else tot.join(pe, groupCols, "left")
    joined.select(g ++ Seq(
      col("__n").as("n"),
      graft.functions.Quantize.scaledFloor(poR, 6).as("po"),
      graft.functions.Quantize.scaledFloor(peR, 6).as("pe"),
      when(peR === 1.0, lit(null).cast("double"))
        .otherwise(graft.functions.Quantize.scaledFloor(
          (poR - peR) / (lit(1.0) - peR), 6)).as("kappa")): _*)
  }

  /** Score-calibration card (reliability diagram): predictions in [0, 1]
    * binned into `bins` equal-width buckets; per bucket the count, the
    * mean predicted score, the observed positive rate, and the |gap|
    * between them — the per-bucket contribution whose n-weighted sum is
    * the expected calibration error (ECE). The card every
    * quality-model gate ([[graft.examples.QualityModel]], the NB scorer)
    * should ship with: a model can rank well and still be miscalibrated,
    * and a curation threshold set on miscalibrated scores admits a
    * different volume than planned.
    *
    * Mean-of-floats is order-sensitive under shuffles, so the bucket mean
    * rides the klFromCorpus integer-grid convention: scores quantized to
    * a 1e-7 grid as longs, integer-summed (order-free), one exact
    * division. One keyed aggregation, map-side combined; output is
    * `bins`-bounded. Scores outside [0, 1] clamp into the edge buckets.
    */
  def reliabilityCard(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int
  ): DataFrame = {
    require(bins >= 2 && bins <= 4096, s"bins=$bins out of [2, 4096]")
    val s = col(scoreCol).cast("double")
    val bin = least(greatest(floor(s * bins).cast("long"), lit(0L)), lit(bins - 1L))
    val c7 = floor(s * 1e7 + 0.5).cast("long")
    cardFromBinCounts(
      df.select(bin.as("bin"), c7.as("__c7"), col(labelCol).cast("boolean").as("__y"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("__c7")).as("__s7"),
          count(when(col("__y"), 1)).as("__pos")))
  }

  /** [[reliabilityCard]]'s finishing expressions off a (bin, n, __s7,
    * __pos) counts frame — shared by the batch card and the streaming
    * calibration monitor
    * ([[graft.streaming.StreamingCalibration.card]]): the per-bin counts
    * are plain longs (associative under any shard merge), so a drained
    * stream's merged snapshots produce BIT-IDENTICAL cards to the batch
    * operator over the same rows. */
  def cardFromBinCounts(binCounts: DataFrame): DataFrame =
    binCounts.select(col("bin"), col("n"),
      graft.functions.Quantize.scaledFloor(
        col("__s7").cast("double") / 1e7 / col("n").cast("double"), 6).as("mean_score"),
      graft.functions.Quantize.scaledFloor(
        col("__pos").cast("double") / col("n").cast("double"), 6).as("frac_pos"))
      .withColumn("abs_gap",
        graft.functions.Quantize.scaledFloor(
          abs(col("mean_score") - col("frac_pos")), 6))

  /** Murphy decomposition of the Brier score — `brier = reliability −
    * resolution + uncertainty` — the ONE-ROW calibration verdict on top
    * of [[reliabilityCard]]'s per-bin view: reliability (how far bin
    * confidence sits from bin accuracy — lower is better-calibrated),
    * resolution (how much the bins separate outcomes — higher is a more
    * useful scorer), uncertainty (the base-rate entropy term, the
    * no-skill floor).
    *
    * Scores are snapped to [[reliabilityCard]]'s 1e-7 integer grid, so
    * the per-row squared error and per-bin means are exact-input doubles;
    * the per-row/per-bin fractional terms are 1e-9-quantized and
    * decimal-summed (the anova discipline) — the decomposition identity
    * then holds to the quantization grid and the whole row is
    * engine-exact. Same binning (`floor(p·bins)` clamped). Output 1 row:
    * (n, base_rate, brier, reliability, resolution, uncertainty).
    */
  def brierDecomposition(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int
  ): DataFrame = {
    require(bins >= 2 && bins <= 4096, s"bins=$bins out of [2, 4096]")
    val q9 = (c: org.apache.spark.sql.Column) =>
      graft.functions.Quantize.scaledFloor(c, 9)
    val q6 = (c: org.apache.spark.sql.Column) =>
      graft.functions.Quantize.scaledFloor(c, 6)
    val s = col(scoreCol).cast("double")
    val base = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(
        least(greatest(floor(s * bins).cast("long"), lit(0L)), lit(bins - 1L)).as("__bin"),
        // the snapped long IS the value of record; __p derives from it —
        // re-deriving the long from __p via (p·1e7).cast(long) TRUNCATES
        // (2999.999… → 2999) while an oracle's rounding cast doesn't,
        // the r11 review's cross-engine divergence catch
        floor(s * 1e7 + 0.5).cast("long").as("__c7"),
        col(labelCol).cast("boolean").cast("int").as("__y"))
      .withColumn("__p", col("__c7").cast("double") / 1e7)
    val perBin = base
      .withColumn("__sq", q9((col("__p") - col("__y")) * (col("__p") - col("__y")))
        .cast("decimal(18,9)"))
      .groupBy(col("__bin"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__c7")).as("__s7"),
        sum(col("__y").cast("long")).as("__pos"),
        sum(col("__sq")).cast("decimal(38,9)").as("__ssq"))
      .localCheckpoint(true) // bins-sized; referenced by tot AND binTerms
    val tot = perBin.agg(sum(col("__n")).as("n"), sum(col("__pos")).as("__gpos"),
      sum(col("__ssq")).cast("decimal(38,9)").as("__gssq"))
    def d(c: String) = col(c).cast("double")
    val yBar = d("__gpos") / d("n")
    val binTerms = perBin.crossJoin(broadcast(tot))
      .select(
        q9(d("__n") * (d("__s7") / 1e7 / d("__n") - d("__pos") / d("__n")) *
          (d("__s7") / 1e7 / d("__n") - d("__pos") / d("__n")))
          .cast("decimal(18,9)").as("__rel"),
        q9(d("__n") * (d("__pos") / d("__n") - yBar) * (d("__pos") / d("__n") - yBar))
          .cast("decimal(18,9)").as("__res"))
      .agg(sum(col("__rel")).cast("decimal(38,9)").as("__srel"),
        sum(col("__res")).cast("decimal(38,9)").as("__sres"))
    tot.crossJoin(broadcast(binTerms))
      // empty input: the global agg still yields one all-null row — emit
      // an EMPTY frame instead (reliabilityCard's absence semantics)
      .filter(col("n").isNotNull)
      .select(col("n"),
        q6(yBar).as("base_rate"),
        q6(d("__gssq") / d("n")).as("brier"),
        q6(d("__srel") / d("n")).as("reliability"),
        q6(d("__sres") / d("n")).as("resolution"),
        q6(yBar * (lit(1.0) - yBar)).as("uncertainty"))
  }

  /** Exact weighted isotonic calibration over score bins — PAV by the
    * MINIMAX closed form `iso(i) = max_{j≤i} min_{k≥i} mean(y, bins j..k)`
    * (Robertson–Wright–Dykstra): the monotone-nondecreasing fit to the
    * per-bin positive rates that the pool-adjacent-violators algorithm
    * produces, computed WITHOUT the sequential pooling loop — the triple
    * (i, j, k) enumeration is B³ rows on a bins-sized frame, so the whole
    * fit is three joins over a knob-sized grid and every mean is one
    * exact-integer division (cumulative positives/counts), making the
    * calibration map engine- and order-exact.
    *
    * This is the standard score-calibration step after a
    * [[reliabilityCard]] shows miscalibration: the returned map sends bin
    * confidence → isotonic probability; monotonicity is guaranteed by
    * construction, so downstream thresholding keeps its ordering
    * semantics. Output: (bin, n, frac_pos, iso) per non-empty bin,
    * iso 1e-6-quantized.
    */
  def isotonicCalibration(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int
  ): DataFrame = {
    require(bins >= 2 && bins <= 256, s"bins=$bins out of [2, 256]")
    val q6 = (c: org.apache.spark.sql.Column) =>
      graft.functions.Quantize.scaledFloor(c, 6)
    val s = col(scoreCol).cast("double")
    val binned = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(
        least(greatest(floor(s * bins).cast("long"), lit(0L)), lit(bins - 1L))
          .as("bin"),
        col(labelCol).cast("boolean").cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("__pos"))
    pavMinimax(binned)
      .select(col("bin"), col("n"),
        q6(col("__pos").cast("double") / col("n").cast("double")).as("frac_pos"),
        q6(col("__iso")).as("iso"))
  }

  /** PAV-minimax core shared by [[isotonicCalibration]] and
    * [[oosCalibratedBrier]]: `binned` is a bins-sized (bin, n, __pos)
    * frame; returns (bin, n, __pos, __iso) with `__iso` the UNQUANTIZED
    * Robertson–Wright–Dykstra closed-form fit `max_{j≤i} min_{k≥i}
    * mean(y, j..k)` — B³ enumeration over knob-bounded joins, every mean
    * one exact-integer division off cumulative prefixes. */
  private def pavMinimax(binned: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // UNPARTITIONED-WINDOW: bounded by the `bins` knob (callers bin
    // scores into a parameter-sized frame before this core)
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned
      .withColumn("__cn", sum(col("n")).over(wCum))
      .withColumn("__cp", sum(col("__pos")).over(wCum))
      .localCheckpoint(true) // bins-sized; referenced by all three legs
    // mean(j..k) from cumulative prefixes: (cp_k − cp_{j−1})/(cn_k − cn_{j−1})
    val jk = cum.select(col("bin").as("__j"),
        (col("__cn") - col("n")).as("__cnj"), (col("__cp") - col("__pos")).as("__cpj"))
      .join(cum.select(col("bin").as("__k"), col("__cn").as("__cnk"),
        col("__cp").as("__cpk")), col("__j") <= col("__k"))
      .select(col("__j"), col("__k"),
        ((col("__cpk") - col("__cpj")).cast("double") /
          (col("__cnk") - col("__cnj")).cast("double")).as("__mean"))
    val inner = cum.select(col("bin")).join(jk,
        col("__j") <= col("bin") && col("__k") >= col("bin"))
      .groupBy(col("bin"), col("__j"))
      .agg(min(col("__mean")).as("__minmean"))
    val iso = inner.groupBy(col("bin")).agg(max(col("__minmean")).as("__iso"))
    cum.select(col("bin"), col("n"), col("__pos")).join(iso, Seq("bin"))
  }

  /** OUT-OF-SAMPLE calibrated Brier — the form a production scorer
    * actually ships (q257's in-sample loop was the documented caveat):
    * fit the PAV isotonic map on the TRAIN split only, apply it to the
    * held-out rows, and report raw vs calibrated Brier on the held-out
    * side alone. Rows where `splitCol === trainValue` train; every other
    * row evaluates.
    *
    * Semantics pinned to the published q256/q257 conventions: scores
    * snap to the 1e-7 grid (`floor(s·1e7+0.5)` carried END-TO-END — the
    * r11 truncation catch), bins clamp to [0, bins), the applied iso
    * value is the 1e-6-snapped map entry (what [[isotonicCalibration]]
    * publishes), and a held-out bin ABSENT from the train map falls back
    * to the identity (its raw scores) — the conservative production
    * default when the calibrator has never seen that confidence region.
    * Within a mapped bin the calibrated sum is closed-form
    * (`n·iso² − 2·iso·pos + pos`); fallback bins reuse their raw
    * per-row Σ(p−y)² (1e-9-quantized decimal sums, order-free).
    *
    * Overfit is exactly what this measures: with small per-bin train
    * counts the PAV map memorizes sampling noise, in-sample Brier
    * improves, and `brier_cal > brier_raw` HERE is the signal to widen
    * bins or pool more data (ProfilerSpec pins such a case).
    *
    * Shape at 100 TB: ONE corpus pass (a (is_train, bin)-keyed count/sum
    * aggregation, ≤ 2·bins output rows), then everything downstream is
    * knob-bounded (bins ≤ 256 enforced, the B³ PAV enumeration and the
    * map join all run on bins-sized frames). Output: one row
    * (n_train, n_test, brier_raw, brier_cal), 1e-6-quantized; empty
    * held-out side → empty frame (the brierDecomposition convention).
    */
  def oosCalibratedBrier(
      df: DataFrame,
      splitCol: String,
      trainValue: String,
      scoreCol: String,
      labelCol: String,
      bins: Int
  ): DataFrame = {
    require(bins >= 2 && bins <= 256, s"bins=$bins out of [2, 256]")
    val q6 = (c: org.apache.spark.sql.Column) =>
      graft.functions.Quantize.scaledFloor(c, 6)
    val q9 = (c: org.apache.spark.sql.Column) =>
      graft.functions.Quantize.scaledFloor(c, 9)
    val s = col(scoreCol).cast("double")
    val stats = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull &&
        col(splitCol).isNotNull)
      .select(
        (col(splitCol) === lit(trainValue)).as("__train"),
        least(greatest(floor(s * bins).cast("long"), lit(0L)), lit(bins - 1L))
          .as("bin"),
        floor(s * 1e7 + 0.5).cast("long").as("__c7"),
        col(labelCol).cast("boolean").cast("long").as("__y"))
      .withColumn("__p", col("__c7").cast("double") / 1e7)
      .withColumn("__sq",
        q9((col("__p") - col("__y")) * (col("__p") - col("__y")))
          .cast("decimal(18,9)"))
      .groupBy(col("__train"), col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("__pos"),
        sum(col("__sq")).cast("decimal(38,9)").as("__ssq"))
      .localCheckpoint(true) // ≤ 2·bins rows; feeds the fit AND both totals
    val isoMap = pavMinimax(
        stats.filter(col("__train")).select(col("bin"), col("n"), col("__pos")))
      .select(col("bin"), q6(col("__iso")).as("__iso")) // the PUBLISHED map
    val nTrain = stats.filter(col("__train"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("n_train"))
    val test = stats.filter(!col("__train"))
      .join(isoMap.hint("shuffle_merge"), Seq("bin"), "left")
      .select(col("n"), col("__pos"), col("__ssq"),
        when(col("__iso").isNotNull,
          q9(col("n").cast("double") * col("__iso") * col("__iso")
            - lit(2.0) * col("__iso") * col("__pos").cast("double")
            + col("__pos").cast("double")).cast("decimal(38,9)"))
          .otherwise(col("__ssq")).as("__cal"))
      .agg(sum(col("n")).as("n_test"),
        sum(col("__ssq")).cast("decimal(38,9)").as("__sraw"),
        sum(col("__cal")).cast("decimal(38,9)").as("__scal"))
    test.crossJoin(broadcast(nTrain))
      .filter(col("n_test").isNotNull) // empty held-out side → empty frame
      .select(col("n_train"), col("n_test"),
        q6(col("__sraw").cast("double") / col("n_test").cast("double"))
          .as("brier_raw"),
        q6(col("__scal").cast("double") / col("n_test").cast("double"))
          .as("brier_cal"))
  }

  /** Two-sample Kolmogorov–Smirnov test between two vintages of a numeric
    * column — the DISTRIBUTION-SHAPE drift test completing the battery
    * ([[psi]] asks how alarmed the scorecard should be, [[mannWhitney]]
    * whether one side dominates; KS bounds the worst-case ECDF gap
    * `D = sup_x |F_A(x) − F_B(x)|`, sensitive to ANY shape change,
    * location or not).
    *
    * D is computed EXACTLY: cumulative counts over the combined distinct
    * values give `|cumA·n_B − cumB·n_A|` as integers, and
    * `D = max/ (n_A·n_B)` is one exact-integer division (documented
    * bound: `n_A·n_B < 2^63`, i.e. ~3·10⁹ rows per side — beyond that,
    * sample). `ks_stat = √(n_A·n_B/(n_A+n_B))·D` and the one-term
    * large-sample significance `p ≈ min(1, 2·exp(−2·ks_stat²))`
    * (Kolmogorov asymptotic; the term every drift monitor thresholds on)
    * are quantized through scaledFloor.
    *
    * Shape: mannWhitney's — one per-value counting aggregation, one
    * value-ordered window over the DISTINCT-value frame
    * (value-cardinality-sized, not corpus-sized), a 1-row totals
    * broadcast, one scalar max. Output: (n_a, n_b, d, ks_stat, p_approx).
    */
  def ksTest(
      dfA: DataFrame,
      dfB: DataFrame,
      valueCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = dfA.select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("__na"))
      .join(dfB.select(col(valueCol).cast("double").as("__v"))
        .filter(col("__v").isNotNull)
        .groupBy(col("__v")).agg(count(lit(1)).as("__nb")), Seq("__v"), "full_outer")
      .select(col("__v"), coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
    // UNPARTITIONED-WINDOW: distinct-value frame, WindowGuard-ed
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = counts.agg(sum(col("__na")).as("__ta"), sum(col("__nb")).as("__tb"))
    counts
      .withColumn("__ca", WindowGuard.guarded(
        sum(col("__na")).over(w), Seq(col("__v")), "ksTest"))
      .withColumn("__cb", sum(col("__nb")).over(w))
      .crossJoin(broadcast(totals))
      .select(col("__ta"), col("__tb"),
        abs(col("__ca") * col("__tb") - col("__cb") * col("__ta")).as("__gap"))
      .groupBy(col("__ta"), col("__tb"))
      .agg(max(col("__gap")).as("__mx"))
      .select(Seq(col("__ta").as("n_a"), col("__tb").as("n_b")) ++ {
        val na = col("__ta").cast("double"); val nb = col("__tb").cast("double")
        val d = col("__mx").cast("double") / (na * nb)
        val ks = sqrt(na * nb / (na + nb)) * d
        Seq(
          graft.functions.Quantize.scaledFloor(d, 6).as("d"),
          graft.functions.Quantize.scaledFloor(ks, 6).as("ks_stat"),
          graft.functions.Quantize.scaledFloor(
            least(lit(1.0), lit(2.0) * exp(lit(-2.0) * ks * ks)), 6).as("p_approx"))
      }: _*)
  }

  /** Cumulative Poisson(1) CDF thresholds c₀…c₈ for the bootstrap's
    * inverse-CDF weight draw. Computed once here and formatted into the
    * oracle SQL via `Double.toString` (shortest round-trip repr), so both
    * engines compare the SAME doubles; draws beyond c₈ (mass < 1.2e-8)
    * cap at weight 9. */
  val poissonCdf1: Seq[Double] = {
    val pmf = Iterator.iterate((math.exp(-1.0), 1)) { case (p, k) => (p / k, k + 1) }
      .map(_._1).take(9).toSeq
    pmf.scanLeft(0.0)(_ + _).tail
  }

  /** Poisson-bootstrap confidence interval for the MEAN of an integral
    * column (Chamandy et al.'s resampling-at-scale trick, the one Google
    * published for exactly this setting): instead of materializing B
    * resamples, every row draws B independent Poisson(1) weights from
    * its salted hash — `Multinomial(n, 1/n) → Poisson(1)` as n grows —
    * so the whole bootstrap is ONE map-side pass. Error bars on any
    * corpus statistic with no distributional assumptions, the thing a
    * plain ±1.96·σ/√n gets wrong on skewed length/score columns.
    *
    * Determinism: the weight is an inverse-CDF walk over [[poissonCdf1]]
    * against `u = (hash(id:b)+0.5)/2⁶⁰` ([[Sampling.keyHash]]'s exact
    * grid); replicate sums are exact longs (the column must be integral
    * — float corpus sums are order-sensitive, the trimmedMean rule);
    * replicate means land on the 1e-9 grid; the CI picks by integer rank
    * (percentile convention: lo = max(1, ⌊α/2·B'⌋), hi = B'−lo+1 over
    * the B' replicates with nonzero total weight — B' = B except on toy
    * inputs). Output means quantized through scaledFloor.
    *
    * Shape: one B-wide explode fused into a map-side-combined keyed
    * aggregation (B groups — the shuffle carries B×partitions partial
    * sums, NOT B×rows), one B-sized rank window, three scalars. The ×B
    * scan cost is the honest price; B ≤ 1000 by contract. Output:
    * (n_rows, reps_used, mean, ci_lo, ci_hi).
    */
  def bootstrapMeanCi(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      reps: Int = 200,
      level: Double = 0.95,
      salt: String = "boot"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    require(reps >= 20 && reps <= 1000, s"reps=$reps out of [20, 1000]")
    require(level > 0.5 && level < 1.0, s"level=$level out of (0.5, 1)")
    require(
      Seq(ByteType, ShortType, IntegerType, LongType).contains(df.schema(valueCol).dataType),
      s"$valueCol must be an integral column — float bootstrap sums are order-sensitive; " +
        "quantize to a grid upstream")
    val rows = df.select(col(idCol).cast("string").as("__id"),
      col(valueCol).cast("long").as("__v"))
      .filter(col("__id").isNotNull && col("__v").isNotNull)
      .localCheckpoint(true) // referenced by the point estimate AND the explode
    val point = rows.agg(count(lit(1)).as("n_rows"), sum(col("__v")).as("__sv"))
    val u = (Sampling.keyHash(concat_ws(":", col("__id"), col("__b")), salt)
      .cast("double") + lit(0.5)) / lit((1L << 60).toDouble)
    val w = poissonCdf1.foldLeft(lit(0L)) { (acc, t) =>
      acc + when(col("__u") >= lit(t), 1L).otherwise(0L)
    }
    val repSums = rows
      .withColumn("__b", explode(sequence(lit(1), lit(reps))))
      .withColumn("__u", u)
      .select(col("__b"), w.as("__w"), col("__v"))
      .groupBy(col("__b"))
      .agg(sum(col("__w") * col("__v")).as("__swv"), sum(col("__w")).as("__sw"))
      .filter(col("__sw") > 0L)
      .select(col("__b"),
        floor(col("__swv").cast("double") / col("__sw").cast("double") * 1e9 + lit(0.5))
          .cast("long").as("__m9"))
    val wAll = Window.partitionBy(lit(1))
    val ranked = repSums
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("__rn", row_number().over(wAll.orderBy(col("__m9"), col("__b"))))
      .withColumn("__lo",
        greatest(lit(1L), floor(col("__m").cast("double") * lit((1.0 - level) / 2.0))
          .cast("long")))
    val ci = ranked
      .filter(col("__rn") === col("__lo") || col("__rn") === col("__m") - col("__lo") + 1L)
      .agg(count(lit(1)).as("__got"), max(col("__m")).as("reps_used"),
        min(col("__m9")).as("__lo9"), max(col("__m9")).as("__hi9"))
    point.crossJoin(broadcast(ci))
      .select(col("n_rows"), col("reps_used"),
        graft.functions.Quantize.scaledFloor(
          col("__sv").cast("double") / col("n_rows").cast("double"), 6).as("mean"),
        graft.functions.Quantize.scaledFloor(
          col("__lo9").cast("double") / 1e9, 6).as("ci_lo"),
        graft.functions.Quantize.scaledFloor(
          col("__hi9").cast("double") / 1e9, 6).as("ci_hi"))
  }

  /** Cross-table reconciliation: keyed sums from two sides compared
    * exactly — the metrics-store audit ("does yesterday's rollup still
    * match a recompute?", "do the orders totals match the lineitem
    * sums?"). Values ride as `decimal(18,scale)` into `decimal(38,scale)`
    * sums (exact in any order, any engine — the q195 discipline), so a
    * reported delta is a REAL discrepancy, never float noise. Only
    * violations are emitted — an empty result CERTIFIES the
    * reconciliation (the riOrphans convention): keys missing on either
    * side or with differing sums, with the exact delta.
    *
    * Shape: two map-side-combined keyed aggregations + one full-outer
    * SMJ join; output is violation-sized. Output: (key, sum_a, sum_b,
    * delta, status ∈ missing_a | missing_b | mismatch).
    */
  def reconcile(
      dfA: DataFrame,
      keyColA: String,
      valueColA: String,
      dfB: DataFrame,
      keyColB: String,
      valueColB: String,
      scale: Int = 2
  ): DataFrame = {
    require(scale >= 0 && scale <= 6, s"scale=$scale out of [0, 6]")
    def side(df: DataFrame, k: String, v: String, nm: String) =
      df.select(col(k).as("key"), col(v).cast(s"decimal(18,$scale)").as("__v"))
        .groupBy(col("key")).agg(sum(col("__v")).cast(s"decimal(38,$scale)").as(nm))
    side(dfA, keyColA, valueColA, "__sa").hint("shuffle_merge")
      .join(side(dfB, keyColB, valueColB, "__sb").hint("shuffle_merge"),
        Seq("key"), "full_outer")
      .filter(col("__sa").isNull || col("__sb").isNull || col("__sa") =!= col("__sb"))
      .select(col("key"),
        col("__sa").cast("double").as("sum_a"),
        col("__sb").cast("double").as("sum_b"),
        (coalesce(col("__sa"), lit(0)) - coalesce(col("__sb"), lit(0)))
          .cast("double").as("delta"),
        when(col("__sa").isNull, lit("missing_a"))
          .when(col("__sb").isNull, lit("missing_b"))
          .otherwise(lit("mismatch")).as("status"))
  }

  /** k-anonymity + l-diversity audit over quasi-identifier columns — the
    * privacy gate before a per-user frame ships ([[graft.operators
    * .TextAnalysis.redactPii]] scrubs free text; THIS audits structure:
    * a (nation, segment) group of size 1 re-identifies its member even
    * with the name column dropped, and a k-large group whose sensitive
    * column is CONSTANT still leaks it — the l-diversity hole).
    * Reports the worst group size, the worst per-group sensitive-value
    * diversity, and how many groups/rows sit below the k and l bars.
    *
    * One (QI…)-keyed aggregation (count + per-group exact distinct via a
    * pre-distinct pass, both map-side combined) + one summary aggregation;
    * output is 1 row. Null sensitive values count as a value (a null IS
    * an observation). Output: (n_rows, n_groups, min_group_size,
    * groups_below_k, rows_below_k, min_l_diversity, groups_below_l).
    */
  def kAnonymityAudit(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      k: Int,
      l: Int
  ): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier column is required")
    require(k >= 2 && l >= 1, s"need k >= 2 and l >= 1, got k=$k l=$l")
    val g = qiCols.map(col)
    val sizes = df.groupBy(g: _*).agg(count(lit(1)).as("__n"))
    val divers = df.select(g :+ col(sensitiveCol).as("__s"): _*).distinct()
      .groupBy(g: _*).agg(count(lit(1)).as("__l"))
    sizes.hint("shuffle_merge").join(divers.hint("shuffle_merge"), qiCols)
      .agg(
        sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("__n")).as("min_group_size"),
        count(when(col("__n") < k, 1)).as("groups_below_k"),
        sum(when(col("__n") < k, col("__n")).otherwise(lit(0L))).as("rows_below_k"),
        min(col("__l")).as("min_l_diversity"),
        count(when(col("__l") < l, 1)).as("groups_below_l"))
  }

  /** Two-pass heavy hitters: Misra–Gries candidates + exact recount — the
    * "which domains/tokens/UAs dominate" report WITHOUT a full
    * (item → count) shuffle. Pass 1 folds the corpus into ONE O(k)
    * [[graft.functions.MisraGries]] summary (map-side partials and merges
    * all k-bounded); the ≤ k candidates are driver-collected (a
    * parameter-bounded watchlist, the q37 class — this is the point: the
    * full distinct-item frame may be corpus-sized, the summary never is);
    * pass 2 exactly recounts JUST the candidates via an isin-filtered
    * map-side-combined aggregation and keeps items with true frequency
    * strictly above n/phiDen.
    *
    * Determinism: MG's sub-threshold survivors are partial-order-
    * dependent, but every item above n/(k+1) is GUARANTEED into the
    * summary; with k ≥ phiDen (enforced: default 2·phiDen) the φ-filter
    * sits at-or-above the guarantee bound, so the FILTERED output is
    * identical on every run and oracle-gateable against the plain
    * exact-count query. Counts in the output are exact (recounted), not
    * the MG lower bounds. Output: (item, cnt, share) by cnt desc, item.
    */
  def heavyHitters(
      df: DataFrame,
      itemCol: String,
      phiDen: Int,
      summaryK: Int = 0
  ): DataFrame = {
    require(phiDen >= 2 && phiDen <= 10000, s"phiDen=$phiDen out of [2, 1e4]")
    val k = if (summaryK > 0) summaryK else 2 * phiDen
    require(k >= phiDen && k <= 100000,
      s"summaryK=$k must be >= phiDen=$phiDen for the guarantee to cover the filter")
    val items = df.select(col(itemCol).cast("string").as("__i"))
      .filter(col("__i").isNotNull)
      .localCheckpoint(true) // scanned by both passes
    val mg = udaf(new graft.functions.MisraGries(k))
    val row = items.agg(mg(col("__i")).as("__sum"), count(lit(1)).as("__n")).head()
    val candidates = row.getAs[Map[String, Long]]("__sum").keys.toSeq.sorted
    val n = row.getAs[Long]("__n")
    items.filter(col("__i").isin(candidates: _*))
      .groupBy(col("__i")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * phiDen > n)
      .select(col("__i").as(itemCol), col("cnt"),
        graft.functions.Quantize.scaledFloor(
          col("cnt").cast("double") / lit(n.toDouble), 6).as("share"))
      .orderBy(col("cnt").desc, col(itemCol))
  }

  /** Exact ROC AUC from the rank-sum identity — the model-evaluation
    * companion to [[reliabilityCard]] (calibration) and the q198 lift
    * chart (business impact): `AUC = P(score⁺ > score⁻) + ½P(tie)`,
    * computed as `(R⁺ − n⁺(n⁺+1)/2)/(n⁺·n⁻)` over midranks — NO
    * trapezoid sweep, no threshold grid, mathematically exact including
    * ties (the identity behind [[mannWhitney]]; an approximate AUC on a
    * threshold grid under-reports near-perfect rankers).
    *
    * Doubled midranks are longs and the rank sum accumulates as
    * decimal(38,0) — exact regardless of order at any n (the mannWhitney
    * argument, with no 2^53 double ceiling); the final division runs in
    * double off that exact decimal, so past n⁺·n⁻ ≈ 9·10^15 pairs the
    * decimal→double cast rounds (relative error ≤ 2^-53) — invisible
    * after scaledFloor quantization. `gini_index =
    * 2·AUC − 1` rides along (the credit-scoring convention). AUC is null
    * when either class is empty. Null scores/labels excluded.
    *
    * Shape: one per-score-value counting aggregation, one score-ordered
    * window over the DISTINCT-value frame (score-cardinality-sized), one
    * scalar aggregate. Output: (n_pos, n_neg, auc, gini_index).
    */
  def rocAuc(
      df: DataFrame,
      scoreCol: String,
      labelCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(col(scoreCol).cast("double").as("__v"), col(labelCol).cast("boolean").as("__y"))
      .filter(col("__v").isNotNull && col("__y").isNotNull)
      .groupBy(col("__v"))
      .agg(count(when(col("__y"), 1)).as("__np"),
        count(when(!col("__y"), 1)).as("__nn"))
    // UNPARTITIONED-WINDOW: distinct-score frame, WindowGuard-ed
    val w = Window.orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, -1)
    counts
      .withColumn("__t", col("__np") + col("__nn"))
      .withColumn("__before", WindowGuard.guarded(
        coalesce(sum(col("__t")).over(w), lit(0L)),
        Seq(col("__v")), "rocAuc"))
      // doubled midrank as exact long → np·2mid rank sum as decimal(38,0),
      // order-free at any n (double np·mid sums hit the 2^53 ceiling —
      // the mannWhitney fix applied here too)
      .withColumn("__mid2", lit(2L) * col("__before") + col("__t") + lit(1L))
      .agg(sum(col("__np")).as("__sp"), sum(col("__nn")).as("__sn"),
        sum(col("__np").cast("decimal(19,0)") * col("__mid2").cast("decimal(19,0)"))
          .as("__rp2"))
      .select(col("__sp").as("n_pos"), col("__sn").as("n_neg"),
        when(col("__sp") > 0L && col("__sn") > 0L,
          graft.functions.Quantize.scaledFloor(
            ((col("__rp2") - col("__sp").cast("decimal(18,0)")
              * (col("__sp") + lit(1L)).cast("decimal(18,0)")).cast("double") / 2.0)
              / (col("__sp").cast("double") * col("__sn").cast("double")), 6)).as("auc"))
      .withColumn("gini_index",
        when(col("auc").isNotNull,
          graft.functions.Quantize.scaledFloor(lit(2.0) * col("auc") - 1.0, 6)))
  }

  /** Mutual information + normalized MI + Cramér's V between two
    * categorical columns — the feature↔label dependence card ("does
    * `source` leak `lang`?", the redundancy check before stratifying on
    * both): `MI = Σ_xy p_xy·ln(p_xy·n²/(n_x·n_y))` in nats,
    * `NMI = MI/√(H_x·H_y)`, and V from the χ² contingency —
    * three views of the same table (MI weights by mass, χ²/V by
    * squared surprise; NMI is scale-free across cardinalities).
    *
    * All counts are exact integers; per-cell MI and per-margin entropy
    * contributions quantize to the 1e-9 integer grid pre-sum (order-free,
    * the q172 class); χ² cell terms likewise, with the ZERO cells'
    * aggregate contribution recovered as `n − Σ_observed E` (each absent
    * cell contributes exactly E, and Σ_all E = n — no dense cell frame
    * needed). NMI is null when either
    * marginal entropy is 0 (a constant column carries no information);
    * V is null when either cardinality is 1. Nulls in either column are
    * EXCLUDED (pairwise-complete).
    *
    * Shape: one (x, y) counting aggregation + two marginal aggregations
    * joined back (all contingency-table-shaped, SMJ-keyed), three 1-row
    * scalars. Output: (n, card_x, card_y, mi, nmi, cramers_v).
    */
  def mutualInformation(
      df: DataFrame,
      xCol: String,
      yCol: String
  ): DataFrame = {
    val base = df
      .select(col(xCol).cast("string").as("__x"), col(yCol).cast("string").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    // the contingency table feeds marginals, totals, and the cell grid —
    // materialize once (table-shaped, tiny), the hits discipline
    val xy = base.groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("__nxy"))
      .localCheckpoint(true)
    val mx = xy.groupBy(col("__x")).agg(sum(col("__nxy")).as("__nx"))
    val my = xy.groupBy(col("__y")).agg(sum(col("__nxy")).as("__ny"))
    val tot = xy.agg(sum(col("__nxy")).as("__n"),
      count(lit(1)).as("__cells"))
    val cards = mx.agg(count(lit(1)).as("__cx"))
      .crossJoin(my.agg(count(lit(1)).as("__cy")))
    val n = col("__n").cast("double")
    val cellGrid = xy
      .join(mx.hint("shuffle_merge"), Seq("__x"))
      .join(my.hint("shuffle_merge"), Seq("__y"))
      .crossJoin(broadcast(tot))
      .select(
        floor(col("__nxy").cast("double") / n *
          log(col("__nxy").cast("double") * n /
            (col("__nx").cast("double") * col("__ny").cast("double"))) * 1e9 + lit(0.5))
          .cast("long").as("__mi9"),
        {
          val e = col("__nx").cast("double") * col("__ny").cast("double") / n
          floor((col("__nxy").cast("double") - e) * (col("__nxy").cast("double") - e) / e
            * 1e9 + lit(0.5)).cast("long").as("__chi9")
        },
        {
          // a ZERO cell contributes E to chi-square but never appears in
          // the observed-cell frame; sum observed E so the missing mass
          // (n - sum E_observed, since sum over ALL cells of E = n) can be
          // added back — without it V understates dependence
          val e = col("__nx").cast("double") * col("__ny").cast("double") / n
          floor(e * 1e9 + lit(0.5)).cast("long").as("__e9")
        })
      .agg(sum(col("__mi9")).as("__mi9"), sum(col("__chi9")).as("__chi9"),
        sum(col("__e9")).as("__e9"))
    def entropyGrid(m: DataFrame, cnt: String) = m
      .crossJoin(broadcast(tot))
      .select(floor(-(col(cnt).cast("double") / n) * log(col(cnt).cast("double") / n)
        * 1e9 + lit(0.5)).cast("long").as("__h9"))
      .agg(sum(col("__h9")).as("__h9"))
    val hx = entropyGrid(mx, "__nx").withColumnRenamed("__h9", "__hx9")
    val hy = entropyGrid(my, "__ny").withColumnRenamed("__h9", "__hy9")
    tot.crossJoin(broadcast(cellGrid))
      .crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .crossJoin(broadcast(cards))
      .select(Seq(col("__n").as("n"), col("__cx").as("card_x"),
        col("__cy").as("card_y")) ++ {
          val mi = col("__mi9").cast("double") / 1e9
          val hxv = col("__hx9").cast("double") / 1e9
          val hyv = col("__hy9").cast("double") / 1e9
          val minCard = least(col("__cx"), col("__cy"))
          Seq(
            graft.functions.Quantize.scaledFloor(mi, 6).as("mi"),
            when(col("__hx9") > 0L && col("__hy9") > 0L,
              graft.functions.Quantize.scaledFloor(mi / sqrt(hxv * hyv), 6)).as("nmi"),
            when(minCard > 1L, graft.functions.Quantize.scaledFloor(
              sqrt((col("__chi9").cast("double") / 1e9 +
                (n - col("__e9").cast("double") / 1e9)) /
                (n * (minCard - 1L).cast("double"))), 6)).as("cramers_v"))
        }: _*)
  }

  /** Krippendorff's α (nominal metric) — the inter-rater reliability
    * statistic for MISSING-DATA annotation matrices, the general form
    * [[cohenKappa]] cannot express (κ needs exactly two raters rating
    * every unit; real labeling campaigns have 3+ raters each covering a
    * subset). `α = 1 − D_o/D_e` over the coincidence matrix of pairable
    * ratings (Krippendorff 2004).
    *
    * Computed WITHOUT the pairwise self-join: within a unit `u` with
    * `m_u ≥ 2` ratings and per-value counts `n_uc`, the disagreeing
    * ordered pair count is `m_u(m_u−1) − Σ_c n_uc(n_uc−1)`, each pair
    * weighted `1/(m_u−1)` — so the unit's observed-disagreement
    * contribution is one exact rational, quantized to the 1e-9 integer
    * grid pre-sum (order-free, the q172 class). The expected side is pure
    * integers: `D_e ∝ n² − Σ_c n_c²` over the pairable marginals.
    * Units with a single rating are EXCLUDED (nothing to pair), null
    * ratings dropped. α is null when `D_e = 0` (every pairable rating
    * identical — reliability undefined, not perfect).
    *
    * Shape: one (unit, value) counting aggregation, one unit-keyed
    * aggregation, one value-keyed marginal aggregation, three 1-row
    * scalars — nothing corpus-shaped joined or broadcast. Output:
    * (n_units, n_ratings, do_rate, de_rate, alpha).
    */
  def krippendorffAlpha(
      df: DataFrame,
      unitCol: String,
      raterCol: String,
      valueCol: String
  ): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(unitCol).as("__u"), col(valueCol).cast("string").as("__c"))
    val uc = base.groupBy(col("__u"), col("__c")).agg(count(lit(1)).as("__nuc"))
    val perUnit = uc.groupBy(col("__u"))
      .agg(sum(col("__nuc")).as("__m"),
        sum(col("__nuc") * (col("__nuc") - 1L)).as("__same"))
      .filter(col("__m") >= 2L)
      .select(col("__u"), col("__m"),
        floor((col("__m") * (col("__m") - 1L) - col("__same")).cast("double") /
          (col("__m") - 1L).cast("double") * 1e9 + lit(0.5)).cast("long").as("__dis9"))
    val marg = uc.join(perUnit.select(col("__u")).hint("shuffle_merge"), Seq("__u"))
      .groupBy(col("__c")).agg(sum(col("__nuc")).as("__nc"))
      .agg(sum(col("__nc")).as("__n"), sum(col("__nc") * col("__nc")).as("__sq"))
    perUnit.agg(count(lit(1)).as("n_units"), sum(col("__dis9")).as("__do9"))
      .crossJoin(broadcast(marg))
      .select(Seq(col("n_units"), col("__n").as("n_ratings")) ++ {
        val n = col("__n").cast("double")
        val doR = col("__do9").cast("double") / 1e9 / n
        val deR = (n * n - col("__sq").cast("double")) / (n * (n - 1.0))
        Seq(
          graft.functions.Quantize.scaledFloor(doR, 6).as("do_rate"),
          graft.functions.Quantize.scaledFloor(deR, 6).as("de_rate"),
          when(col("__sq") === col("__n") * col("__n"), lit(null).cast("double"))
            .otherwise(graft.functions.Quantize.scaledFloor(
              lit(1.0) - doR / deR, 6)).as("alpha"))
      }: _*)
  }
}
