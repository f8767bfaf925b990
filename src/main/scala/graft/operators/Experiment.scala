package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experimentation readouts over deterministic hash assignment — the
  * product-analytics leg: assignment IS [[Sampling.hashSplit]] (salted
  * 2⁶⁰ grid, so arm membership is layout/run/engine-stable and any SQL
  * engine reproduces it), statistics are exact integers to the final
  * divisions.
  */
object Experiment {

  /** Two-arm A/B readout with the sample-ratio-mismatch guard: users
    * hash-assigned to arms a/b at `pA`, per-arm conversion counted, and
    * THREE numbers every experiment page needs:
    *
    *  - `lift`: relative rate change (b vs a), null when a never converts;
    *  - `z_conv`: pooled two-proportion z for the conversion delta —
    *    null when the pooled rate is 0 or 1 (no variance);
    *  - `z_srm` + `srm_flag`: `(n_a − n·pA)/√(n·pA(1−pA))` against the
    *    DESIGNED share — the assignment-health gate (|z| > 3 means the
    *    pipeline lost users asymmetrically and the conversion readout is
    *    untrustworthy; checking SRM before reading the metric is the
    *    experimentation-hygiene rule this operator bakes in).
    *
    * Shape: one pure assignment projection + ONE map-side-combined
    * scalar aggregation; nothing user-shaped survives. Output 1 row:
    * (n_a, n_b, conv_a, conv_b, rate_a, rate_b, lift, z_conv, z_srm,
    * srm_flag).
    */
  /** CUPED variance reduction (Deng et al. 2013): the pre-period
    * covariate adjustment every mature experimentation platform applies —
    * `y_adj = y − θ(x − x̄)` with `θ = cov(x, y)/var(x)` shrinks metric
    * variance by exactly ρ², buying the same statistical power with
    * (1 − ρ²)× the users. This readout computes θ and the achieved
    * reduction from EXACT decimal sufficient statistics (the q195
    * pearson discipline — n, Σx, Σy, Σxy, Σxx, Σyy as decimal(38,8), so
    * the answer is sharding- and engine-independent): `var_adj = var_y −
    * cov²/var_x` (population form), `reduction = 1 − var_adj/var_y = ρ²`.
    * θ and reduction are null when var_x = 0 (constant pre-period —
    * nothing to adjust on); reduction also null when var_y = 0.
    *
    * One map-side-combined scalar aggregation; 1-row output:
    * (n, theta, var_y, var_adj, var_reduction).
    */
  def cuped(
      df: DataFrame,
      preCol: String,
      postCol: String,
      decimalScale: Int = 2
  ): DataFrame = {
    val x = col(preCol).cast(s"decimal(18,$decimalScale)")
    val y = col(postCol).cast(s"decimal(18,$decimalScale)")
    val complete = df.filter(col(preCol).isNotNull && col(postCol).isNotNull)
    val sums = complete.agg(count(lit(1)).as("n"),
      sum(x).cast("decimal(38,8)").as("__sx"),
      sum(y).cast("decimal(38,8)").as("__sy"),
      sum((x * y).cast("decimal(38,8)")).as("__sxy"),
      sum((x * x).cast("decimal(38,8)")).as("__sxx"),
      sum((y * y).cast("decimal(38,8)")).as("__syy"))
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val vx = (nD * d("__sxx") - d("__sx") * d("__sx")) / (nD * nD)
    val vy = (nD * d("__syy") - d("__sy") * d("__sy")) / (nD * nD)
    val cv = (nD * d("__sxy") - d("__sx") * d("__sy")) / (nD * nD)
    val q6: (Column, String) => Column =
      (c, nm) => graft.functions.Quantize.scaledFloor(c, 6).as(nm)
    sums.select(col("n"),
      when(vx > 0.0, q6(cv / vx, "t")).as("theta"),
      q6(vy, "var_y"),
      when(vx > 0.0, q6(vy - cv * cv / vx, "va")).as("var_adj"),
      when(vx > 0.0 && vy > 0.0, q6(cv * cv / vx / vy, "vr")).as("var_reduction"))
  }

  /** The permutation coin shared by [[permutationTest]] and
    * [[permutationTestByGroup]] — uniform in (0,1) from the salted
    * per-(unit, replicate) hash grid; the two operators MUST stay
    * bit-identical here (a spec pins single ≡ grouped on one group). */
  private def permCoin(salt: String): Column =
    (Sampling.keyHash(concat_ws(":", col("__id"), col("__b")), salt)
      .cast("double") + lit(0.5)) / lit((1L << 60).toDouble)

  private def requireIntegral(df: DataFrame, valueCol: String): Unit = {
    import org.apache.spark.sql.types._
    require(
      Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(valueCol).dataType),
      s"$valueCol must be an integral column — float corpus sums are order-sensitive")
  }

  /** Deterministic permutation test for a two-arm mean difference — the
    * distribution-free significance check when the metric is skewed
    * enough that the z approximation lies (heavy-tailed engagement
    * counts, spend): `reps` pseudo-assignments re-split users by
    * `hash(user:b)` at the OBSERVED arm-a share, the observed
    * |mean_b − mean_a| is ranked against the permutation diffs, and
    * `p = (1 + #{|diff_perm| ≥ |diff_obs|}) / (reps + 1)` (the add-one
    * convention — a permutation p is never exactly 0).
    *
    * Determinism: the metric must be INTEGRAL (exact long sums — the
    * trimmedMean rule); every per-replicate mean is an exact-input
    * division and the comparison replays identically in any engine; the
    * pseudo-assignment coin is the salted 2⁶⁰ grid, so the whole null
    * distribution is reproducible (no RNG, no seed drift across
    * executors). Shape: one scalar observed aggregation + one
    * reps-wide explode fused into a map-side-combined (b)-keyed
    * aggregation (shuffle carries reps×partitions partials) + one
    * reps-sized count. Output 1 row: (n_a, n_b, mean_a, mean_b,
    * diff_obs, reps, p_value).
    */
  def permutationTest(
      users: DataFrame,
      userCol: String,
      armCol: String,
      valueCol: String,
      reps: Int,
      salt: String
  ): DataFrame = {
    require(reps >= 20 && reps <= 1000, s"reps=$reps out of [20, 1000]")
    requireIntegral(users, valueCol)
    val base = users.select(col(userCol).cast("string").as("__id"),
      col(armCol).cast("string").as("__arm"), col(valueCol).cast("long").as("__v"))
      .filter(col("__id").isNotNull && col("__v").isNotNull &&
        col("__arm").isin("a", "b"))
      .localCheckpoint(true) // scanned by the observed pass AND the explode
    val obs = base.agg(
      count(when(col("__arm") === "a", 1)).as("n_a"),
      count(when(col("__arm") === "b", 1)).as("n_b"),
      sum(when(col("__arm") === "a", col("__v")).otherwise(0L)).as("__sa"),
      sum(when(col("__arm") === "b", col("__v")).otherwise(0L)).as("__sb"))
      .localCheckpoint(true) // 1 row, referenced three times
    val u = permCoin(salt)
    val perms = base
      .withColumn("__b", explode(sequence(lit(1), lit(reps))))
      .crossJoin(broadcast(obs.select(col("n_a"), col("n_b"))))
      .withColumn("__pa",
        u < col("n_a").cast("double") / (col("n_a") + col("n_b")).cast("double"))
      .groupBy(col("__b"))
      .agg(sum(when(col("__pa"), col("__v")).otherwise(0L)).as("__psa"),
        sum(when(!col("__pa"), col("__v")).otherwise(0L)).as("__psb"),
        count(when(col("__pa"), 1)).as("__pna"),
        count(when(!col("__pa"), 1)).as("__pnb"))
      .filter(col("__pna") > 0L && col("__pnb") > 0L)
      .select((col("__psb").cast("double") / col("__pnb").cast("double") -
        col("__psa").cast("double") / col("__pna").cast("double")).as("__pd"))
    val q6: (Column, String) => Column =
      (c, nm) => graft.functions.Quantize.scaledFloor(c, 6).as(nm)
    obs.crossJoin(broadcast(perms.crossJoin(broadcast(obs)).agg(
      count(lit(1)).as("__used"),
      count(when(abs(col("__pd")) >=
        abs(col("__sb").cast("double") / col("n_b").cast("double") -
          col("__sa").cast("double") / col("n_a").cast("double")), 1)).as("__ge"))))
      .select(col("n_a"), col("n_b"),
        q6(col("__sa").cast("double") / col("n_a").cast("double"), "mean_a"),
        q6(col("__sb").cast("double") / col("n_b").cast("double"), "mean_b"),
        q6(col("__sb").cast("double") / col("n_b").cast("double") -
          col("__sa").cast("double") / col("n_a").cast("double"), "diff_obs"),
        col("__used").as("reps"),
        q6((col("__ge") + 1L).cast("double") / (col("__used") + 1L).cast("double"),
          "p_value"))
  }

  def abReadout(
      users: DataFrame,
      userCol: String,
      convertedCol: String,
      salt: String,
      pA: Double = 0.5
  ): DataFrame = {
    require(pA > 0.0 && pA < 1.0, s"pA must be in (0, 1), got $pA")
    val assigned = Sampling.hashSplit(
      users.select(col(userCol), col(convertedCol).cast("boolean").as("__c")),
      userCol, Seq("a" -> pA, "b" -> (1.0 - pA)), salt)
    val agg = assigned.agg(
      count(when(col("split") === "a", 1)).as("n_a"),
      count(when(col("split") === "b", 1)).as("n_b"),
      count(when(col("split") === "a" && col("__c"), 1)).as("conv_a"),
      count(when(col("split") === "b" && col("__c"), 1)).as("conv_b"))
    readoutFromCounts(agg, pA)
  }

  /** [[abReadout]]'s closed form off a 1-row (n_a, n_b, conv_a, conv_b)
    * counts frame — shared by the batch readout and the streaming
    * SRM monitor ([[graft.streaming.StreamingSrmMonitor.readout]]):
    * because the counts are plain longs (associative under any shard
    * merge), a drained stream's merged snapshots produce BIT-IDENTICAL
    * output to the batch readout over the same users. */
  def readoutFromCounts(agg: DataFrame, pA: Double = 0.5): DataFrame = {
    require(pA > 0.0 && pA < 1.0, s"pA must be in (0, 1), got $pA")
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ra = col("conv_a").cast("double") / na
    val rb = col("conv_b").cast("double") / nb
    val pooled = (col("conv_a") + col("conv_b")).cast("double") / (na + nb)
    val q6: (Column, String) => Column =
      (c, nm) => graft.functions.Quantize.scaledFloor(c, 6).as(nm)
    agg.select(
      col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      q6(ra, "rate_a"), q6(rb, "rate_b"),
      when(col("conv_a") > 0L, q6((rb - ra) / ra, "lift")).as("lift"),
      when(pooled > 0.0 && pooled < 1.0,
        q6((rb - ra) / sqrt(pooled * (lit(1.0) - pooled) * (lit(1.0) / na + lit(1.0) / nb)),
          "z")).as("z_conv"),
      q6((na - (na + nb) * lit(pA)) /
        sqrt((na + nb) * lit(pA) * lit(1.0 - pA)), "z_srm"),
      (abs((na - (na + nb) * lit(pA)) /
        sqrt((na + nb) * lit(pA) * lit(1.0 - pA))) > 3.0).as("srm_flag"))
  }

  /** [[permutationTest]] per segment: the same Fisher randomization test
    * run independently in every group — "WHICH segments moved", the sweep
    * whose per-segment p-values then need [[Inference.bhAdjust]]'s FDR
    * control before anyone reads them (k segments at α ≈ kα false alarms
    * uncorrected; the q251 composition wires the two together).
    *
    * The permutation coin is the SAME salted per-(unit, rep) hash as the
    * single test — group membership doesn't re-randomize a unit — and
    * each group's coin probability is its own observed n_a share, joined
    * from the groups-sized observed frame (enum groups by contract, so
    * the join side is broadcast-sized). Replicates whose permutation
    * empties an arm are dropped per group (the single-test rule). Output:
    * (groups…, n_a, n_b, diff_obs, reps, p_value) — p null when a group
    * lacks either arm entirely.
    */
  def permutationTestByGroup(
      users: DataFrame,
      groupCols: Seq[String],
      userCol: String,
      armCol: String,
      valueCol: String,
      reps: Int,
      salt: String
  ): DataFrame = {
    require(reps >= 20 && reps <= 1000, s"reps=$reps out of [20, 1000]")
    require(groupCols.nonEmpty, "at least one group column is required")
    requireIntegral(users, valueCol)
    val keys = groupCols.map(col)
    val base = users.select(keys :+ col(userCol).cast("string").as("__id")
        :+ col(armCol).cast("string").as("__arm")
        :+ col(valueCol).cast("long").as("__v"): _*)
      .filter(col("__id").isNotNull && col("__v").isNotNull &&
        col("__arm").isin("a", "b"))
      .localCheckpoint(true) // scanned by the observed pass AND the explode
    val obs = base.groupBy(keys: _*).agg(
      count(when(col("__arm") === "a", 1)).as("n_a"),
      count(when(col("__arm") === "b", 1)).as("n_b"),
      sum(when(col("__arm") === "a", col("__v")).otherwise(0L)).as("__sa"),
      sum(when(col("__arm") === "b", col("__v")).otherwise(0L)).as("__sb"))
      .localCheckpoint(true) // groups-sized, referenced by coin AND readout
    val u = permCoin(salt)
    val perms = base
      .withColumn("__b", explode(sequence(lit(1), lit(reps))))
      .join(broadcast(obs.select(keys :+ col("n_a") :+ col("n_b"): _*)), groupCols)
      .withColumn("__u", u)
      .withColumn("__pa",
        col("__u") < col("n_a").cast("double") / (col("n_a") + col("n_b")).cast("double"))
      .groupBy(keys :+ col("__b"): _*)
      .agg(sum(when(col("__pa"), col("__v")).otherwise(0L)).as("__psa"),
        sum(when(!col("__pa"), col("__v")).otherwise(0L)).as("__psb"),
        count(when(col("__pa"), 1)).as("__pna"),
        count(when(!col("__pa"), 1)).as("__pnb"))
      .filter(col("__pna") > 0L && col("__pnb") > 0L)
      .select(keys :+ (col("__psb").cast("double") / col("__pnb").cast("double") -
        col("__psa").cast("double") / col("__pna").cast("double")).as("__pd"): _*)
    val dObs = col("__sb").cast("double") / col("n_b").cast("double") -
      col("__sa").cast("double") / col("n_a").cast("double")
    val counted = perms
      .join(broadcast(obs), groupCols)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("__used"),
        count(when(abs(col("__pd")) >= abs(dObs), 1)).as("__ge"))
    val q6: (Column, String) => Column =
      (c, nm) => graft.functions.Quantize.scaledFloor(c, 6).as(nm)
    obs.join(counted.hint("shuffle_merge"), groupCols, "left")
      .select(keys ++ Seq(col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0, q6(dObs, "d")).as("diff_obs"),
        coalesce(col("__used"), lit(0L)).as("reps"),
        when(col("n_a") > 0 && col("n_b") > 0 && col("__used").isNotNull,
          q6((col("__ge") + 1L).cast("double") / (col("__used") + 1L).cast("double"),
            "p")).as("p_value")): _*)
  }

  /** Stratified nearest-score matching — the observational-data companion
    * to the randomized readouts above: each treated unit is matched (WITH
    * replacement) to the control whose score is nearest within its
    * stratum, matches farther than `caliper` are discarded, and the
    * output is the matched-pairs ATT `mean(y_treated − y_matched)` per
    * stratum — the propensity-score-matching estimator with a
    * deterministic, engine-reproducible match rule.
    *
    * Match rule: units sort by (score, is_treated, id) within the stratum
    * (controls before treated at equal score, so a same-score control
    * matches at distance 0); each treated row takes the last preceding
    * and first following CONTROL (ignore-nulls window picks), chooses the
    * nearer by exact decimal distance (ties → preceding), and keeps the
    * match iff distance ≤ caliper. Every step is a total-order window or
    * an exact decimal comparison — any engine replays it bitwise.
    *
    * Scale contract: one window pair per stratum — strata must be
    * enum-sized (the spearman funnel contract); nothing unit-shaped is
    * broadcast or collected. ATT sums exact decimal outcome diffs and
    * divides once. Output: (strata…, n_treated, n_matched, att) — att
    * null when nothing matched.
    */
  def matchedOutcomes(
      units: DataFrame,
      strataCols: Seq[String],
      idCol: String,
      treatedCol: String,
      scoreCol: String,
      outcomeCol: String,
      caliper: Double,
      decimalScale: Int = 2
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(strataCols.nonEmpty, "at least one stratum column is required")
    require(caliper > 0.0, s"caliper must be positive, got $caliper")
    val keys = strataCols.map(col)
    val base = units
      .filter(col(scoreCol).isNotNull && col(outcomeCol).isNotNull &&
        col(treatedCol).isNotNull)
      .select(keys :+ col(idCol).as("__id")
        :+ col(treatedCol).cast("boolean").as("__t")
        :+ col(scoreCol).cast(s"decimal(18,$decimalScale)").as("__s")
        :+ col(outcomeCol).cast(s"decimal(18,$decimalScale)").as("__y"): _*)
    val ord = Window.partitionBy(keys: _*)
      .orderBy(col("__s"), col("__t").cast("int"), col("__id"))
    val prevW = ord.rowsBetween(Window.unboundedPreceding, -1)
    val nextW = ord.rowsBetween(1, Window.unboundedFollowing)
    val ctrlS = when(!col("__t"), col("__s"))
    val ctrlY = when(!col("__t"), col("__y"))
    val cal = lit(caliper).cast(s"decimal(18,$decimalScale)")
    val scored = base
      .withColumn("__ps", last(ctrlS, ignoreNulls = true).over(prevW))
      .withColumn("__py", last(ctrlY, ignoreNulls = true).over(prevW))
      .withColumn("__ns", first(ctrlS, ignoreNulls = true).over(nextW))
      .withColumn("__ny", first(ctrlY, ignoreNulls = true).over(nextW))
      .filter(col("__t"))
      .withColumn("__dp", col("__s") - col("__ps"))
      .withColumn("__dn", col("__ns") - col("__s"))
      .withColumn("__usePrev",
        col("__ps").isNotNull &&
          (col("__ns").isNull || col("__dp") <= col("__dn")))
      .withColumn("__d",
        when(col("__usePrev"), col("__dp")).otherwise(col("__dn")))
      .withColumn("__my",
        when(col("__usePrev"), col("__py")).otherwise(col("__ny")))
      .withColumn("__ok", col("__d").isNotNull && col("__d") <= cal)
    scored.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_treated"),
        sum(when(col("__ok"), 1L).otherwise(0L)).as("n_matched"),
        sum(when(col("__ok"), col("__y") - col("__my")))
          .cast("decimal(38,8)").as("__sd"))
      .select(keys :+ col("n_treated") :+ col("n_matched")
        :+ when(col("n_matched") > 0,
          graft.functions.Quantize.scaledFloor(
            col("__sd").cast("double") / col("n_matched").cast("double"), 6))
          .as("att"): _*)
  }

  /** z_{0.975} and z_{0.80} to 6 places — the α=0.05 two-sided /
    * power=0.80 defaults, pinned as LITERALS so any SQL oracle uses the
    * identical constants (neither engine exposes a normal quantile both
    * sides agree on bit-for-bit; six places is far inside the planning
    * tolerance of a sample-size estimate). */
  val ZAlpha025: Double = 1.959964
  val ZBeta20: Double = 0.841621

  /** Mixture-SPRT always-valid readout (Johari et al., "Peeking at A/B
    * Tests" / the Optimizely stats engine): a CONTINUOUSLY-watched
    * experiment ([[graft.streaming.StreamingSrmMonitor]]'s whole point)
    * cannot use fixed-n z-tests — peeking at every epoch inflates the
    * false-positive rate without bound. The mixture likelihood ratio
    * against a normal-mixture alternative of scale τ² is a
    * nonnegative supermartingale under H₀, so `p_t = min_{s ≤ t} 1/Λ_s`
    * is a VALID p-value at every cut simultaneously:
    *
    * `log Λ = ½·ln(se²/(se²+τ²)) + δ̂²·τ²/(2·se²·(se²+τ²))`
    *
    * with δ̂ = p̂_b − p̂_a and se² the pooled two-proportion variance at
    * the cut. Input: one row per cut (cutCol ascending) of CUMULATIVE
    * counts (n_a, n_b, conv_a, conv_b) — exactly the max-epoch-per-shard
    * sums a drained [[graft.streaming.StreamingSrmMonitor.counts]]
    * stream yields at each epoch, or a batch enrollment-accrual frame.
    * Cuts where either arm is empty or the pooled rate is degenerate
    * (se² = 0) carry a null log Λ and pass the running p through
    * unchanged.
    *
    * Engine-exactness: rates and δ̂ are exact-input doubles off long
    * counts; `ln`/`exp` ride the q172 convention (quantize AFTER the
    * transcendental — both engines' libm agree on these inputs, ulps
    * against grid boundaries are the accepted class). Output per cut:
    * (cutCol, n_a, n_b, diff, log_lambda, p_always) with diff/log Λ/p
    * scaled-floor quantized and `p_always` the running min of
    * min(1, exp(−log Λ)) over cuts so far — monotone nonincreasing by
    * construction.
    *
    * Shape: one cuts-sized projection + one ordered window over the cuts
    * frame (cuts are epochs/days — bounded by contract, never
    * user-shaped). */
  def msprtReadout(
      cuts: DataFrame,
      cutCol: String,
      tau2: Double
  ): DataFrame = {
    require(tau2 > 0.0, s"tau2 must be positive, got $tau2")
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ra = col("conv_a").cast("double") / na
    val rb = col("conv_b").cast("double") / nb
    val pooled = (col("conv_a") + col("conv_b")).cast("double") / (na + nb)
    val se2 = pooled * (lit(1.0) - pooled) * (lit(1.0) / na + lit(1.0) / nb)
    val diff = rb - ra
    val ok = col("n_a") >= 1L && col("n_b") >= 1L && se2 > 0.0
    msprtFinish(cuts, cutCol, tau2, diff, se2, ok)
  }

  /** Continuous-metric sibling of [[msprtReadout]] — the normal-mean
    * mSPRT over the per-arm MOMENT state the streaming monitors already
    * carry ([[Inference.momentPartial]]'s (n, Σx, Σx²) triple): input is
    * one row per cut (cutCol ascending) of CUMULATIVE per-arm moments
    * (n_a, sum_a, sumsq_a, n_b, sum_b, sumsq_b; sums exact — longs or
    * decimals off an integral metric, the [[permutationTest]] rule), and
    * the readout is the same always-valid mixture-LR machinery with
    *
    * δ̂ = x̄_b − x̄_a, se² = s²_a/n_a + s²_b/n_b
    *
    * (Welch/unpooled variance of the mean difference, s² the sample
    * variance off the exact moments: (Σx² − n·x̄²)/(n−1)). Cuts where
    * either arm has n < 2 or se² is degenerate carry a null log Λ and
    * pass the running p through unchanged. Same output columns,
    * quantization discipline, and cuts-bounded global-window contract as
    * [[msprtReadout]]. */
  def msprtMeanReadout(
      cuts: DataFrame,
      cutCol: String,
      tau2: Double
  ): DataFrame = {
    require(tau2 > 0.0, s"tau2 must be positive, got $tau2")
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ma = col("sum_a").cast("double") / na
    val mb = col("sum_b").cast("double") / nb
    val va = (col("sumsq_a").cast("double") - na * ma * ma) / (na - lit(1.0))
    val vb = (col("sumsq_b").cast("double") - nb * mb * mb) / (nb - lit(1.0))
    val se2 = va / na + vb / nb
    val diff = mb - ma
    val ok = col("n_a") >= 2L && col("n_b") >= 2L && se2 > 0.0
    msprtFinish(cuts, cutCol, tau2, diff, se2, ok)
  }

  /** The shared mixture-LR finishing stage of the two mSPRT readouts:
    * quantized δ̂ and log Λ per valid cut, running-min always-valid p off
    * the QUANTIZED log Λ (both engines exponentiate the same grid point,
    * the outer q6 collapses exp's ulp). One ordered window over the cuts
    * frame — cuts are epochs/days, bounded by contract, never
    * user-shaped. */
  private def msprtFinish(
      cuts: DataFrame,
      cutCol: String,
      tau2: Double,
      diff: Column,
      se2: Column,
      ok: Column
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q6 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 6)
    val logLambda =
      lit(0.5) * log(se2 / (se2 + lit(tau2))) +
        diff * diff * lit(tau2) / (lit(2.0) * se2 * (se2 + lit(tau2)))
    // UNPARTITIONED-WINDOW: bounded by the analysis-cut count (a
    // monitoring-schedule parameter, tens of rows)
    val w = Window.orderBy(col(cutCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cuts
      .withColumn("diff", when(ok, q6(diff)))
      .withColumn("log_lambda", when(ok, q6(logLambda)))
      .withColumn("p_always",
        q6(coalesce(min(when(col("log_lambda").isNotNull,
          least(lit(1.0), exp(-col("log_lambda"))))).over(w), lit(1.0))))
      .select(col(cutCol), col("n_a"), col("n_b"), col("diff"),
        col("log_lambda"), col("p_always"))
  }

  /** Two-proportion sample-size (power) analysis — the experiment
    * PLANNING readout that closes the loop the rest of this file reads
    * out: given each group's observed base conversion rate and a grid of
    * minimum detectable effects (absolute deltas), the users PER ARM for
    * a two-sided α test at the given power:
    *
    * `n = (z_{1−α/2}·√(2·p̄(1−p̄)) + z_{1−β}·√(p₁(1−p₁)+p₂(1−p₂)))² / δ²`
    *
    * with p₁ the base rate, p₂ = p₁ + δ, p̄ their mean (the standard
    * pooled/unpooled hybrid, Fleiss et al.). Base rates are quantized to
    * the 1e-6 grid BEFORE the closed form (both engines then compute
    * from identical inputs) and z constants are the shared literals
    * above, so the whole row is engine-exact. Rows where p₂ ≥ 1 emit a
    * null n (the effect is unmeasurable from that base rate). `n_per_arm`
    * is kept on the 1e-6 double grid rather than ceil'd — a planning
    * readout, not an allocator; ceil at the call site if needed.
    *
    * Shape: one map-side-combined keyed aggregation (groups-sized) + a
    * |mdes|-wide literal explode — nothing user-shaped survives. Output:
    * (groups…, base_rate, mde, n_per_arm), one row per group × MDE.
    */
  def powerAnalysis(
      df: DataFrame,
      groupCols: Seq[String],
      userCol: String,
      convertedCol: String,
      mdes: Seq[Double],
      zAlpha: Double = ZAlpha025,
      zBeta: Double = ZBeta20
  ): DataFrame = {
    require(mdes.nonEmpty && mdes.forall(m => m > 0.0 && m < 1.0),
      s"MDEs must be in (0, 1), got $mdes")
    val keys = groupCols.map(col)
    val q6 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 6)
    // the unit of analysis is the USER: distinct counts make the base
    // rate per-user even on non-deduped (event-level) input, honoring
    // the "users per arm" contract instead of silently computing a
    // per-event rate
    val rates = df.groupBy(keys: _*)
      .agg(countDistinct(col(userCol)).as("__n"),
        countDistinct(when(col(convertedCol).cast("boolean"), col(userCol))).as("__c"))
      .select(keys :+ q6(col("__c").cast("double") / col("__n").cast("double"))
        .as("base_rate"): _*)
    val p1 = col("base_rate")
    val p2 = p1 + col("mde")
    val pBar = (p1 + p2) / lit(2.0)
    val num = lit(zAlpha) * sqrt(lit(2.0) * pBar * (lit(1.0) - pBar)) +
      lit(zBeta) * sqrt(p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2))
    rates
      .withColumn("mde", explode(array(mdes.map(lit): _*)))
      .withColumn("n_per_arm",
        when(p2 < 1.0, q6(num * num / (col("mde") * col("mde")))))
  }

  /** Bradley–Terry preference strengths from pairwise duels — the
    * aggregation step of every pairwise-human-preference pipeline
    * (annotator A/B votes, model-output win/loss logs): given one row
    * per duel (winner, loser), the MM fixed-point (Hunter 2004)
    *
    * `p_i ← W_i / Σ_j n_ij / (p_i + p_j)`
    *
    * run for a FIXED number of iterations with per-step normalization
    * (Σp = |items|), so strengths are comparable across runs.
    *
    * Engine-exactness: the classic float iteration is a corpus-order
    * trap (the Σ_j is a float sum), so every p lives on an INTEGER
    * nano-grid (units of 1e-9): per-pair terms are computed in double
    * off exact integer inputs, floor-quantized BACK to long units, and
    * the Σ_j is then an exact long sum — order-free, bit-identical in
    * any engine; normalization keeps units ≤ |items|·1e9, so nothing
    * approaches long range. Items that never win are floored at one
    * unit (p = 1e-9) instead of collapsing to a 0/0 death spiral.
    *
    * Shape: ONE corpus-sized counting aggregation (map-side combined)
    * up front; every iteration is two items-bounded SMJ joins + one
    * exact long-sum aggregation over the PAIRS-bounded symmetric count
    * frame, localCheckpoint'd so the plan stays linear in iterations
    * (the [[graft.operators.Graph.hits]] discipline). Output: (item,
    * strength [1e-6 grid], wins, duels), one row per item. */
  def bradleyTerry(
      duels: DataFrame,
      winnerCol: String,
      loserCol: String,
      iterations: Int = 8
  ): DataFrame = {
    val d = duels.select(col(winnerCol).cast("string").as("__w"),
      col(loserCol).cast("string").as("__l"))
    // corpus → pairs-bounded exact counts; everything below is items/pairs-sized
    val ordered = d.groupBy(col("__w"), col("__l")).agg(count(lit(1)).as("__n"))
    bradleyTerryFromCounts(ordered, "__w", "__l", "__n", iterations)
  }

  /** The MM fixed point of [[bradleyTerry]] starting FROM an exact
    * (winner, loser, n) pair-count table — the composition point for
    * streams: [[graft.streaming.StreamingBradleyTerry]] folds duels into
    * pairs-bounded per-shard counts, and the drained merge feeds this
    * shared fit, so drain ≡ batch by construction (counts are
    * associative; everything downstream is the same expressions). */
  def bradleyTerryFromCounts(
      counts: DataFrame,
      winnerCol: String,
      loserCol: String,
      nCol: String,
      iterations: Int = 8
  ): DataFrame = {
    require(iterations >= 1 && iterations <= 32,
      s"iterations=$iterations out of [1,32] — deep fixed-point chains should checkpoint")
    val q6 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 6)
    val ordered = counts.select(col(winnerCol).cast("string").as("__w"),
        col(loserCol).cast("string").as("__l"), col(nCol).cast("long").as("__n"))
      .localCheckpoint(true)
    val items = ordered.select(col("__w").as("item"))
      .union(ordered.select(col("__l").as("item"))).distinct()
    val wins = items.join(
        ordered.groupBy(col("__w").as("item")).agg(sum(col("__n")).as("__wn"))
          .hint("shuffle_merge"),
        Seq("item"), "left")
      .select(col("item"), coalesce(col("__wn"), lit(0L)).as("wins"))
      .localCheckpoint(true)
    val sym = ordered.select(col("__w").as("i"), col("__l").as("j"), col("__n"))
      .unionByName(ordered.select(col("__l").as("i"), col("__w").as("j"), col("__n")))
      .groupBy(col("i"), col("j")).agg(sum(col("__n")).as("nij"))
      .localCheckpoint(true)
    val init = wins.select(col("item"), lit(1000000000L).as("u"))
    val fitted = (1 to iterations).foldLeft(init) { (p, _) =>
      val terms = sym
        .join(p.select(col("item").as("i"), col("u").as("__ui")).hint("shuffle_merge"), "i")
        .join(p.select(col("item").as("j"), col("u").as("__uj")).hint("shuffle_merge"), "j")
        .select(col("i"),
          // exact long add inside the cast, then one double divide/multiply
          // — floor back to units so the Σ_j below is an exact long sum
          floor(col("nij").cast("double")
            / ((col("__ui") + col("__uj")).cast("double") / lit(1.0e9))
            * lit(1.0e9) + lit(0.5)).as("tu"))
      val denom = terms.groupBy(col("i")).agg(sum(col("tu")).as("__du"))
      val raw = wins
        .join(denom.hint("shuffle_merge"), wins("item") === denom("i"), "left")
        .select(col("item"),
          greatest(floor(
            when(col("__du").isNotNull && col("__du") > 0L,
              col("wins").cast("double") / (col("__du").cast("double") / lit(1.0e9)))
              .otherwise(lit(0.0)) * lit(1.0e9) + lit(0.5)), lit(1L)).as("__u0"))
      val norm = raw.agg(sum(col("__u0")).as("__su"), count(lit(1)).as("__c"))
      raw.crossJoin(broadcast(norm))
        .select(col("item"),
          greatest(floor(col("__u0").cast("double")
            * ((col("__c") * lit(1000000000L)).cast("double") / col("__su").cast("double"))
            + lit(0.5)), lit(1L)).as("u"))
        .localCheckpoint(true)
    }
    val duelCounts = sym.groupBy(col("i").as("item")).agg(sum(col("nij")).as("duels"))
    fitted
      .join(wins.hint("shuffle_merge"), "item")
      .join(duelCounts.hint("shuffle_merge"), "item")
      .select(col("item"), q6(col("u").cast("double") / lit(1.0e9)).as("strength"),
        col("wins"), col("duels"))
  }

  /** Position-bias audit for pairwise-preference data — the first QC
    * check on any A/B annotation stream: if the item shown FIRST wins
    * materially more than half the time, the labels measure layout, not
    * preference. Input: one row per duel with the winner and the item
    * that was presented first; output one row (n_duels, first_wins,
    * first_rate, z_position) — the exact binomial z against the fair
    * coin, `z = (2k − n)/√n`, rate and z on the 1e-6 grid off exact
    * integer counts (engine-exact: one counting aggregation, a closed
    * form of two longs). */
  def positionBias(
      duels: DataFrame,
      winnerCol: String,
      firstCol: String
  ): DataFrame = {
    val q6 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 6)
    val counts = duels.agg(
      count(lit(1)).as("n_duels"),
      count(when(col(winnerCol) === col(firstCol), 1)).as("first_wins"))
    val n = col("n_duels").cast("double"); val k = col("first_wins").cast("double")
    counts.select(col("n_duels"), col("first_wins"),
      when(col("n_duels") >= 1L, q6(k / n)).as("first_rate"),
      when(col("n_duels") >= 1L,
        q6((lit(2.0) * k - n) / sqrt(n))).as("z_position"))
  }

  /** Transitivity audit for pairwise-preference data — does a single
    * global ranking even exist? Majority-vote each unordered pair
    * (ties undecided), then count CIRCULAR TRIADS (i beats j beats k
    * beats i) among the triples whose three pairs are all decided —
    * the classic consistency statistic (Kendall–Babington Smith): a
    * high circular share means the Bradley–Terry/ranking model is
    * fitting noise. Output one row: (items, decided_pairs,
    * decided_triads, circular_triads, circular_share [1e-6 grid]).
    *
    * Shape: one corpus-sized counting aggregation, then joins over the
    * ITEMS-bounded majority digraph (triads are |items|³ with items
    * bounded by contract — event types, model variants, never users).
    * All counts exact longs; the share is one exact-input division. */
  def transitivityAudit(
      duels: DataFrame,
      winnerCol: String,
      loserCol: String
  ): DataFrame = {
    val q6 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 6)
    val d = duels.select(col(winnerCol).cast("string").as("__w"),
      col(loserCol).cast("string").as("__l"))
    val ordered = d.groupBy(col("__w"), col("__l")).agg(count(lit(1)).as("__n"))
      .localCheckpoint(true)
    val items = ordered.select(col("__w").as("item"))
      .union(ordered.select(col("__l").as("item"))).distinct()
    // per unordered pair: wins in each direction; majority = decided edge
    val lo = least(col("__w"), col("__l")); val hi = greatest(col("__w"), col("__l"))
    val pairs = ordered
      .groupBy(lo.as("a"), hi.as("b"))
      .agg(sum(when(col("__w") === least(col("__w"), col("__l")), col("__n"))
          .otherwise(0L)).as("__ab"),
        sum(when(col("__w") === greatest(col("__w"), col("__l")), col("__n"))
          .otherwise(0L)).as("__ba"))
    val decided = pairs.filter(col("__ab") =!= col("__ba"))
      .select(
        when(col("__ab") > col("__ba"), col("a")).otherwise(col("b")).as("src"),
        when(col("__ab") > col("__ba"), col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint(true)
    // undirected decided pairs (a < b) for the triad universe
    val und = decided.select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b"))
    // triples i<j<k with all three pairs decided
    val triads = und.as("ij")
      .join(und.as("jk"), col("ij.b") === col("jk.a"))
      .join(und.as("ik"),
        col("ik.a") === col("ij.a") && col("ik.b") === col("jk.b"))
      .agg(count(lit(1)).as("decided_triads"))
    // directed 3-cycles, each counted 3 times (one per rotation)
    val cycles = decided.as("e1")
      .join(decided.as("e2"), col("e1.dst") === col("e2.src"))
      .join(decided.as("e3"),
        col("e2.dst") === col("e3.src") && col("e3.dst") === col("e1.src"))
      // count each cycle once: anchor at its least item
      .filter(col("e1.src") < col("e2.src") && col("e1.src") < col("e3.src"))
      .agg(count(lit(1)).as("circular_triads"))
    val nItems = items.agg(count(lit(1)).as("items"))
    val nDecided = decided.agg(count(lit(1)).as("decided_pairs"))
    nItems.crossJoin(nDecided).crossJoin(triads).crossJoin(cycles)
      .select(col("items"), col("decided_pairs"), col("decided_triads"),
        col("circular_triads"),
        when(col("decided_triads") >= 1L,
          q6(col("circular_triads").cast("double")
            / col("decided_triads").cast("double"))).as("circular_share"))
  }

  /** Continuous-metric sibling of [[powerAnalysis]] — sample size for a
    * two-arm MEAN test: given each group's observed metric variance and
    * a grid of minimum detectable effects (absolute deltas in metric
    * units), the observations per arm for a two-sided α test at the
    * given power:
    *
    * `n = 2·σ²·(z_{1−α/2} + z_{1−β})² / δ²`
    *
    * σ² is the sample variance off exact decimal moments (the metric
    * must be INTEGRAL — the [[permutationTest]] rule — so Σx/Σx² are
    * exact and both engines feed the closed form identical inputs),
    * quantized to the 1e-6 grid BEFORE the closed form; z constants are
    * the shared literals. The unit of analysis is the OBSERVATION (one
    * row = one sample); pre-aggregate per user first when the design
    * randomizes users. Groups with fewer than 2 observations emit a null
    * variance and null n. `n_per_arm` stays on the 1e-6 double grid
    * (planning readout, not an allocator).
    *
    * Shape: one map-side-combined keyed aggregation (groups-sized) + a
    * |mdes|-wide literal explode. Output: (groups…, variance, mde,
    * n_per_arm), one row per group × MDE. */
  def powerAnalysisMean(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      mdes: Seq[Double],
      zAlpha: Double = ZAlpha025,
      zBeta: Double = ZBeta20
  ): DataFrame = {
    require(mdes.nonEmpty && mdes.forall(_ > 0.0),
      s"MDEs must be positive absolute deltas, got $mdes")
    requireIntegral(df, valueCol)
    val keys = groupCols.map(col)
    val q6 = (c: Column) => graft.functions.Quantize.scaledFloor(c, 6)
    val v = col(valueCol).cast("decimal(19,0)")
    val stats = df.groupBy(keys: _*)
      .agg(count(col(valueCol)).as("__n"),
        sum(v.cast("decimal(38,0)")).as("__s"),
        sum((v * v).cast("decimal(38,0)")).as("__ss"))
    val n = col("__n").cast("double")
    val mean = col("__s").cast("double") / n
    val variance = (col("__ss").cast("double") - n * mean * mean) / (n - lit(1.0))
    val zsum = lit(zAlpha) + lit(zBeta)
    stats
      .select(keys :+ when(col("__n") >= 2L, q6(variance)).as("variance"): _*)
      .withColumn("mde", explode(array(mdes.map(lit): _*)))
      .withColumn("n_per_arm",
        q6(lit(2.0) * zsum * zsum * col("variance") / (col("mde") * col("mde"))))
  }
}
