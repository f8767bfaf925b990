package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical statistical inference over grouped frames — the
  * experimentation / data-audit leg beyond [[Profiler]]'s descriptive
  * battery: rank correlation, two-sample and k-sample location tests, and
  * the ratio-metric jackknife every sessions-per-user readout needs.
  *
  * House discipline throughout: sufficient statistics are EXACT (integer
  * ranks, decimal-cast measures, decimal(38,·) sums), so every statistic is
  * sharding-, layout-, and engine-independent; doubles appear only in the
  * final closed form, gated by [[graft.functions.Quantize.scaledFloor]].
  * Where a statistic needs a sum of intrinsically-fractional per-row terms
  * (jackknife pseudo-values), each term is quantized to a FIXED decimal
  * scale first and summed exactly — the float-sum order-sensitivity fix
  * the r10 self-review institutionalized.
  */
object Inference {

  private def q6(c: Column): Column = graft.functions.Quantize.scaledFloor(c, 6)

  /** Spearman rank correlation per group — Pearson on average ranks, the
    * monotone-association measure robust to the heavy-tailed magnitudes
    * Pearson's r is dragged by (price-style columns).
    *
    * Ranks are DOUBLED average ranks, `2·minrank + ties − 1` (an integer:
    * minrank from `rank()`, ties from a partition count), so the rank
    * frame is exact-integer and ρ — invariant under the ×2 — computes from
    * decimal sums with zero float accumulation. Products are decimal-cast
    * BEFORE multiplying (2n·2n overflows Long past n ≈ 1.5e9 — the 100 TB
    * guard).
    *
    * Scale contract: ranking is a per-group window — groups must be
    * strata-sized (enum keys), the same contract as every window op here;
    * the hot-group escape is [[Skew.groupedRank]]. Output:
    * (groups…, n, rho); rho null when either side is constant.
    */
  def spearmanByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      xCol: String,
      yCol: String,
      decimalScale: Int = 2
  ): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column is required")
    val keys = groupCols.map(col)
    val complete = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(keys :+ col(xCol).cast(s"decimal(18,$decimalScale)").as("__x")
        :+ col(yCol).cast(s"decimal(18,$decimalScale)").as("__y"): _*)
    // Both terms share ONE window spec: the tie count is the PEER count
    // of the ordering (RANGE CURRENT ROW..CURRENT ROW), identical to the
    // former count over partitionBy(keys :+ c) but evaluated inside the
    // same WindowExec as rank() — one sort per column instead of two
    // (r18: halved q236's window passes; 600k-row group frames sort once)
    def rank2(c: String): Column = {
      val w = Window.partitionBy(keys: _*).orderBy(col(c))
      lit(2) * rank().over(w) +
        count(lit(1)).over(w.rangeBetween(Window.currentRow, Window.currentRow)) - lit(1)
    }
    val ranked = complete
      .withColumn("__rx", rank2("__x").cast("decimal(18,0)"))
      .withColumn("__ry", rank2("__y").cast("decimal(18,0)"))
    val sums = ranked.groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__rx")).cast("decimal(38,0)").as("__sx"),
        sum(col("__ry")).cast("decimal(38,0)").as("__sy"),
        sum((col("__rx") * col("__ry")).cast("decimal(38,0)")).as("__sxy"),
        sum((col("__rx") * col("__rx")).cast("decimal(38,0)")).as("__sxx"),
        sum((col("__ry") * col("__ry")).cast("decimal(38,0)")).as("__syy"))
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val vx = nD * d("__sxx") - d("__sx") * d("__sx")
    val vy = nD * d("__syy") - d("__sy") * d("__sy")
    val num = nD * d("__sxy") - d("__sx") * d("__sy")
    sums.select(keys :+ col("n") :+
      when(vx > 0.0 && vy > 0.0, q6(num / sqrt(vx * vy))).as("rho"): _*)
  }

  /** Welch's unequal-variance t-test between two arms — the default
    * two-sample location test (Student's equal-variance form is never the
    * safer choice; Welch costs nothing and is valid under variance
    * imbalance, the common case when a treatment changes engagement
    * spread, not just level).
    *
    * Routes through [[momentPartial]] + [[welchFromMoments]]: one
    * map-side-combined aggregation produces both arms' exact
    * (n, Σx, Σx²); t and the Welch–Satterthwaite df are closed-form
    * doubles at the end — and because the partials are mergeable, the
    * same readout runs off [[momentMerge]]d daily shards bit-identically
    * (the q259 vintage composition). Output 1 row: (n_a, n_b, mean_a,
    * mean_b, t_stat, df_welch) — t/df null when either arm has n < 2 or
    * both sample variances are 0 (no standard error to divide by).
    */
  def welchTTest(
      df: DataFrame,
      armCol: String,
      valueCol: String,
      armA: String,
      armB: String,
      decimalScale: Int = 2
  ): DataFrame =
    welchFromMoments(
      momentPartial(df.filter(col(armCol) === armA || col(armCol) === armB),
        Seq(armCol), valueCol, decimalScale),
      armCol, armA, armB)

  /** MERGEABLE sufficient-statistic partial for the moment-based tests
    * ([[welchTTest]], [[anovaOneWay]]): one shard's exact
    * (keys…, n, sx, sxx) with the value decimal-cast at `decimalScale`
    * and both sums decimal(38,8) — associative and commutative BIT-
    * EXACTLY, so [[momentMerge]] over any sharding (daily vintages,
    * backfills, per-source shards) equals the from-scratch aggregate
    * regardless of shard boundaries, merge order, or engine (the
    * [[Rollup]] contract applied to the inference battery: shards write
    * partials once, every later readout merges key-count-sized tables
    * instead of rescanning corpora). Null values are excluded here —
    * exactly the rows the from-scratch tests drop. ONE map-side-combined
    * aggregation per shard. */
  def momentPartial(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      decimalScale: Int = 2
  ): DataFrame = {
    require(keys.nonEmpty, "at least one key column is required")
    val x = col(valueCol).cast(s"decimal(18,$decimalScale)")
    df.filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x).cast("decimal(38,8)").as("sx"),
        sum((x * x).cast("decimal(38,8)")).as("sxx"))
  }

  /** Merge any number of [[momentPartial]] tables over the same keys:
    * one keyed aggregation over key-count-sized inputs. Associative —
    * merge(merge(a, b), c) == merge(a, b, c) bit for bit. */
  def momentMerge(partials: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(partials.nonEmpty, "at least one partial table is required")
    partials.foreach { p =>
      require(Seq("n", "sx", "sxx").forall(p.columns.contains),
        s"not a moment-partial table: ${p.columns.mkString(", ")}")
    }
    partials.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sx")).cast("decimal(38,8)").as("sx"),
        sum(col("sxx")).cast("decimal(38,8)").as("sxx"))
  }

  /** [[welchTTest]]'s readout from a (armCol, n, sx, sxx) moments frame
    * ([[momentPartial]] / [[momentMerge]] output) — the scorecard path
    * that never rescans: identical output schema and BIT-IDENTICAL
    * values to the from-scratch test (decimal partials make the
    * regrouping exact; the closed form runs on the same sums). Arms
    * other than `armA`/`armB` in the frame are ignored. */
  def welchFromMoments(
      moments: DataFrame,
      armCol: String,
      armA: String,
      armB: String
  ): DataFrame = {
    def side(arm: String, nm: String) = Seq(
      sum(when(col(armCol) === arm, col("n")).otherwise(0L)).as(s"n_$nm"),
      sum(when(col(armCol) === arm, col("sx"))).cast("decimal(38,8)").as(s"__s_$nm"),
      sum(when(col(armCol) === arm, col("sxx"))).cast("decimal(38,8)").as(s"__ss_$nm"))
    val aggs = side(armA, "a") ++ side(armB, "b")
    val sums = moments.agg(aggs.head, aggs.tail: _*)
    def nD(nm: String) = col(s"n_$nm").cast("double")
    def d(c: String) = col(c).cast("double")
    // sample variance from exact sums: (n·Σx² − (Σx)²) / (n(n−1))
    def sv(nm: String) =
      (nD(nm) * d(s"__ss_$nm") - d(s"__s_$nm") * d(s"__s_$nm")) /
        (nD(nm) * (nD(nm) - 1.0))
    val va = sv("a"); val vb = sv("b")
    val sea = va / nD("a"); val seb = vb / nD("b")
    val se2 = sea + seb
    val ok = col("n_a") >= 2 && col("n_b") >= 2 && se2 > 0.0
    // t is oriented b MINUS a — the same direction as abReadout's lift /
    // z_conv and permutationTest's diff_obs, so a composed scorecard row
    // (q248) carries one sign convention throughout
    sums.select(
      col("n_a"), col("n_b"),
      q6(d("__s_a") / nD("a")).as("mean_a"),
      q6(d("__s_b") / nD("b")).as("mean_b"),
      when(ok, q6((d("__s_b") / nD("b") - d("__s_a") / nD("a")) / sqrt(se2)))
        .as("t_stat"),
      when(ok, q6((se2 * se2) /
        (sea * sea / (nD("a") - 1.0) + seb * seb / (nD("b") - 1.0))))
        .as("df_welch"))
  }

  /** One-way ANOVA F across k groups — "does the mean differ across any
    * stratum", the k-sample generalization of the t-test (language,
    * source, event-type effect checks before slicing further).
    *
    * Two-stage: per-group exact (n, Σx, Σx²) — map-side combined — then a
    * k-row reduction. The between-groups term needs Σ_g S_g²/n_g, a sum of
    * intrinsically-fractional per-group values: each is quantized to a
    * fixed 1e-6 grid and summed as decimal(38,6), so the F statistic is
    * reduction-order-independent (the documented ±k·1e-6 bias on the sum
    * is deterministic, part of the contract, and far below any decision
    * threshold). Output 1 row: (k, n, ss_between, ss_within, f_stat) —
    * f null when df_within = 0 or SSW = 0.
    */
  def anovaOneWay(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      decimalScale: Int = 2
  ): DataFrame =
    anovaFromMoments(
      momentPartial(df.filter(col(groupCol).isNotNull), Seq(groupCol),
        valueCol, decimalScale))

  /** [[anovaOneWay]]'s readout from a (group, n, sx, sxx) moments frame
    * ([[momentPartial]] / [[momentMerge]] output): identical output and
    * bit-identical values to the from-scratch test — the per-group
    * S²/n terms quantize AFTER the merge reconstructs each group's exact
    * sums, so shard boundaries can never leak into the statistic. */
  def anovaFromMoments(moments: DataFrame): DataFrame = {
    val per = moments.select(col("n").as("__n"),
      col("sx").as("__s"), col("sxx").as("__ss"))
    val term = graft.functions.Quantize.scaledFloor(
      col("__s").cast("double") * col("__s").cast("double") /
        col("__n").cast("double"), 6).cast("decimal(38,6)")
    val tot = per.agg(
      count(lit(1)).as("k"),
      sum(col("__n")).as("n"),
      sum(col("__s")).cast("decimal(38,8)").as("__gs"),
      sum(col("__ss")).cast("decimal(38,8)").as("__gss"),
      sum(term).cast("decimal(38,6)").as("__sqn"))
    def d(c: String) = col(c).cast("double")
    // clamp at 0: identical group means make true SSB 0, but the
    // 1e-6-quantized terms can overshoot by up to k·5e-7 and the raw
    // difference lands slightly NEGATIVE — an out-of-domain F otherwise
    val ssb = greatest(d("__sqn") - d("__gs") * d("__gs") / d("n"), lit(0.0))
    val ssw = d("__gss") - d("__sqn")
    val dfb = d("k") - 1.0
    val dfw = d("n") - d("k")
    val ok = col("k") >= 2 && dfw > 0.0 && ssw > 0.0
    tot.select(col("k"), col("n"),
      q6(ssb).as("ss_between"), q6(ssw).as("ss_within"),
      when(ok, q6((ssb / dfb) / (ssw / dfw))).as("f_stat"))
  }

  /** Kendall τ-b per group via the exact pair join — concordant/discordant
    * counting with the tie-corrected denominator
    * `(C − D) / √((C+D+T_y)(C+D+T_x))` (T_x = pairs tied in x only, so
    * C+D+T_y = pairs distinct in x = n₀−n₁; likewise for y).
    *
    * Per-group QUADRATIC BY CONTRACT (the q168 blocking trade): the pair
    * join is an SMJ self-join keyed on the group, so candidate count is
    * Σ_g n_g²/2 — compose with [[Skew.capPerKey]] upstream to bound n_g
    * (exact τ on a deterministic per-group sample), exactly as the q239
    * query does. All counts are integers from one aggregation; τ is one
    * double division. `idCol` must be unique within group — it generates
    * each unordered pair once. Output: (groups…, n, n_pairs, concordant,
    * discordant, tau_b); τ null when either denominator factor is 0.
    */
  def kendallTauB(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      xCol: String,
      yCol: String,
      decimalScale: Int = 2
  ): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column is required")
    val keys = groupCols.map(col)
    val proj = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(keys :+ col(idCol).as("__id")
        :+ col(xCol).cast(s"decimal(18,$decimalScale)").as("__x")
        :+ col(yCol).cast(s"decimal(18,$decimalScale)").as("__y"): _*)
    val l = proj.as("l"); val r = proj.as("r")
    val joinCond = groupCols.map(c => col(s"l.$c") === col(s"r.$c"))
      .reduce(_ && _) && col("l.__id") < col("r.__id")
    val pairs = l.hint("shuffle_merge").join(r.hint("shuffle_merge"), joinCond)
    val sgn = (signum(col("l.__x") - col("r.__x")).cast("int") *
      signum(col("l.__y") - col("r.__y")).cast("int"))
    val counts = pairs.groupBy(groupCols.map(c => col(s"l.$c").as(c)): _*)
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(sgn === 1, 1L).otherwise(0L)).as("concordant"),
        sum(when(sgn === -1, 1L).otherwise(0L)).as("discordant"),
        sum(when(col("l.__x") === col("r.__x") && col("l.__y") =!= col("r.__y"), 1L)
          .otherwise(0L)).as("__tx"),
        sum(when(col("l.__y") === col("r.__y") && col("l.__x") =!= col("r.__x"), 1L)
          .otherwise(0L)).as("__ty"))
    val ns = proj.groupBy(keys: _*).agg(count(lit(1)).as("n"))
    def d(c: String) = col(c).cast("double")
    val f1 = d("concordant") + d("discordant") + d("__ty")
    val f2 = d("concordant") + d("discordant") + d("__tx")
    ns.join(counts.hint("shuffle_merge"), groupCols, "left")
      .select(keys :+ col("n")
        :+ coalesce(col("n_pairs"), lit(0L)).as("n_pairs")
        :+ coalesce(col("concordant"), lit(0L)).as("concordant")
        :+ coalesce(col("discordant"), lit(0L)).as("discordant")
        :+ when(f1 > 0.0 && f2 > 0.0,
          q6((d("concordant") - d("discordant")) / sqrt(f1 * f2))).as("tau_b"): _*)
  }

  /** Delete-1 jackknife standard error for a RATIO-of-sums metric
    * θ = Σy/Σx over analysis units — the correct uncertainty for
    * revenue-per-session / events-per-user style metrics, where the naive
    * per-unit-mean SE is wrong because units contribute unequal
    * denominators (Fieller/delta alternatives need distributional
    * assumptions; the jackknife needs none).
    *
    * `df` must already be unit-level (one row per unit). Leave-one-out
    * pseudo-values θ_i = (Σy−y_i)/(Σx−x_i) come from exact group-window
    * decimal sums, each quantized to the 1e-9 grid and summed as
    * decimal — so SE² = (n−1)/n · Σ(θ_i − θ̄)² is order-independent.
    * Output: (groups…, n, theta, se_jack); se null when n < 2 or any
    * leave-one-out denominator is 0 (pseudo-value undefined).
    *
    * Scale contract: per-group windows (strata-sized groups), one pass +
    * one aggregation; nothing unit-shaped survives.
    */
  def ratioJackknife(
      df: DataFrame,
      groupCols: Seq[String],
      numCol: String,
      denCol: String,
      decimalScale: Int = 2
  ): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column is required")
    val keys = groupCols.map(col)
    val w = Window.partitionBy(keys: _*)
    val y = col(numCol).cast(s"decimal(18,$decimalScale)")
    val x = col(denCol).cast(s"decimal(18,$decimalScale)")
    val base = df.filter(col(numCol).isNotNull && col(denCol).isNotNull)
      .select(keys :+ y.as("__y") :+ x.as("__x"): _*)
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sy", sum(col("__y")).over(w).cast("decimal(38,8)"))
      .withColumn("__sx", sum(col("__x")).over(w).cast("decimal(38,8)"))
    val looDen = col("__sx") - col("__x")
    val theta_i = graft.functions.Quantize.scaledFloor(
      (col("__sy") - col("__y")).cast("double") / looDen.cast("double"), 9)
    val rows = base
      .withColumn("__bad", when(looDen === 0, 1L).otherwise(0L))
      .withColumn("__ti",
        when(looDen =!= 0, theta_i).otherwise(lit(0.0)).cast("decimal(18,9)"))
    val agg = rows.groupBy(keys: _*)
      .agg(max(col("__n")).as("n"),
        max(col("__sy")).as("__gy"), max(col("__sx")).as("__gx"),
        sum(col("__bad")).as("__nbad"),
        sum(col("__ti")).cast("decimal(38,9)").as("__st"),
        sum((col("__ti") * col("__ti")).cast("decimal(38,18)")).as("__stt"))
    def d(c: String) = col(c).cast("double")
    val nD = d("n")
    val ssDev = d("__stt") - d("__st") * d("__st") / nD
    val ok = col("n") >= 2 && col("__nbad") === 0 && col("__gx") =!= 0
    agg.select(keys :+ col("n")
      :+ when(col("__gx") =!= 0, q6(d("__gy") / d("__gx"))).as("theta")
      :+ when(ok, q6(sqrt(greatest(ssDev, lit(0.0)) * (nD - 1.0) / nD)))
        .as("se_jack"): _*)
  }

  /** Mann–Kendall monotone-trend test per key: `S = Σ_{i<j} sgn(v_j −
    * v_i)` over the time order, tie-corrected variance
    * `Var = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18`, and the
    * continuity-corrected normal z — the NONPARAMETRIC "is this series
    * drifting" gate ([[TimeSeries.theilSen]] estimates the slope; this
    * tests its existence without assuming linearity or normal noise).
    *
    * S and the tie term are exact integers from one pair self-join and
    * one value-multiplicity aggregation (the kendallTauB machinery turned
    * temporal); doubles appear only in the final z. Per-key QUADRATIC BY
    * CONTRACT — series must be calendar-bucketed upstream (the theilSen /
    * changepoint contract), never raw-event-sized. Output: (keys…, n,
    * s_stat, var_s, z) — z null when Var ≤ 0 (n < 2 or all values tied).
    */
  def mannKendall(
      df: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      valueCol: String,
      decimalScale: Int = 2
  ): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column is required")
    val keys = keyCols.map(col)
    val base = df.filter(col(timeCol).isNotNull && col(valueCol).isNotNull)
      .select(keys :+ col(timeCol).as("__t")
        :+ col(valueCol).cast(s"decimal(18,$decimalScale)").as("__v"): _*)
    val l = base.as("l"); val r = base.as("r")
    val joinCond = keyCols.map(c => col(s"l.$c") === col(s"r.$c"))
      .reduce(_ && _) && col("l.__t") < col("r.__t")
    val sPairs = l.hint("shuffle_merge").join(r.hint("shuffle_merge"), joinCond)
      .groupBy(keyCols.map(c => col(s"l.$c").as(c)): _*)
      .agg(sum(signum(col("r.__v") - col("l.__v")).cast("long")).as("s_stat"))
    val cnt = col("__cnt").cast("decimal(12,0)")
    val ties = base.groupBy(keys :+ col("__v"): _*)
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(keys: _*)
      .agg(sum((cnt * (cnt - 1) * (cnt * 2 + 5)).cast("decimal(38,0)")).as("__tie"))
    val ns = base.groupBy(keys: _*).agg(count(lit(1)).as("n"))
    val nDec = col("n").cast("decimal(12,0)")
    val varNum = (nDec * (nDec - 1) * (nDec * 2 + 5)).cast("decimal(38,0)") -
      col("__tie")
    val varS = varNum.cast("double") / 18.0
    val sD = col("s_stat").cast("double")
    ns.join(sPairs.hint("shuffle_merge"), keyCols, "left")
      .join(ties.hint("shuffle_merge"), keyCols)
      .select(keys :+ col("n")
        :+ coalesce(col("s_stat"), lit(0L)).as("s_stat")
        :+ q6(varS).as("var_s")
        :+ when(varS > 0.0,
          when(col("s_stat") > 0, q6((sD - 1.0) / sqrt(varS)))
            .when(col("s_stat") < 0, q6((sD + 1.0) / sqrt(varS)))
            .otherwise(lit(0.0))).as("z"): _*)
  }

  /** Benjamini–Hochberg FDR adjustment over a battery of p-values — the
    * multiple-comparisons hygiene every per-segment test sweep needs
    * (k segments each tested at α means ~kα false alarms; BH bounds the
    * FALSE DISCOVERY RATE at α instead). Classic step-up as adjusted
    * p-values: rank p ascending, `p_adj(i) = min(1, min_{j≥i} p_j·m/j)`
    * (the suffix-min makes adjusted p monotone), reject when ≤ α.
    *
    * The frame is tests-sized BY CONTRACT (one row per segment/test), so
    * the global rank window is trivially small. `tieCols` break equal-p
    * rank ties deterministically. p inputs are already grid-quantized by
    * the producing tests, so `p·m/rank` is a fixed IEEE expression — any
    * engine replays the adjustment bitwise. Output: input + (m, rank,
    * p_adj, reject).
    */
  def bhAdjust(
      df: DataFrame,
      pCol: String,
      tieCols: Seq[String],
      alpha: Double
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0, 1), got $alpha")
    require(tieCols.nonEmpty, "tieCols must break equal-p ordering ties")
    // UNPARTITIONED-WINDOW: hypothesis-count frame (one row per TEST,
    // not per observation), WindowGuard-ed
    val ord = Window.orderBy(col(pCol) +: tieCols.map(col): _*)
    val sufMin = Window.orderBy(col("rank"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df.filter(col(pCol).isNotNull)
      .withColumn("m", count(lit(1)).over(Window.partitionBy(lit(1))))
      .withColumn("rank", WindowGuard.guarded(
        row_number().over(ord).cast("long"),
        col(pCol) +: tieCols.map(col), "bhFdr"))
      .withColumn("p_adj", q6(least(lit(1.0),
        min(col(pCol) * col("m").cast("double") / col("rank").cast("double"))
          .over(sufMin))))
      .withColumn("reject", col("p_adj") <= alpha)
  }
}
