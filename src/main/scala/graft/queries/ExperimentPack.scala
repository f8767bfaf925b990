package graft.queries
import graft.Tables
import graft.operators.{AsofJoin, Chunking, Dedup, Multimodal, Profiler, RangeJoin, Rollup, Sampling, Similarity, Sketches, Skew, TextAnalysis, TimeSeries, Tokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import PackShared._

/** Experimentation: A/B readout with SRM guard, CUPED, permutation tests + FDR, matched-pairs ATT, raking, quantile treatment effects, log-rank, the composed scorecard.
  *
  * Conventions: every computed column aliased identically on both
  * engines, deterministic ORDER BY, exact-decimal float sums — see
  * [[QueryPack]]. */
object ExperimentPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Vintage-composed Welch readout off MERGEABLE moment partials: two
    // order vintages (pre/post 1995) each write their exact per-arm
    // (n, Σx, Σx²) partial; the readout merges the partials and computes
    // Welch t WITHOUT rescanning — bit-identical to the from-scratch test
    // by the decimal-partial contract (the q139 metrics-store economics
    // applied to experiment scorecards). Value = total price snapped to
    // integer cents on BOTH engines (the double→decimal cast rounds
    // differently across engines; the explicit floor(x·100+0.5) doesn't).
    "q259_vintage_welch" -> ((s, d) => {
      val armed = Sampling.hashSplit(
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderdate"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents")),
        "o_custkey", Seq("a" -> 0.5, "b" -> 0.5), "exp2")
      val cut = lit("1995-01-01").cast("timestamp")
      val vintages = Seq(armed.filter(col("o_orderdate") < cut),
        armed.filter(col("o_orderdate") >= cut))
      val parts = vintages.map(v =>
        graft.operators.Inference.momentPartial(v, Seq("split"), "cents",
          decimalScale = 0))
      graft.operators.Inference.welchFromMoments(
        graft.operators.Inference.momentMerge(parts, Seq("split")),
        "split", "a", "b")
    }),

    // q230's CONTINUOUS form driven for real: the same per-user
    // conversion frame staged to a 3-file directory, drained by an actual
    // readStream (maxFilesPerTrigger=1 → ≥3 micro-batches) through the
    // O(1)-per-shard streaming SRM fold, snapshots merged by max-epoch +
    // long sum — the readout must be BIT-IDENTICAL to q230's batch SQL
    // oracle, which is the whole drain≡batch contract under the hash gate.
    "q260_streaming_srm" -> ((s, d) => {
      import s.implicits._
      val staged = Tables.events(s, d).groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
        .select(pmod(col("user_id"), lit(4)).cast("int").as("_1"),
          col("user_id").cast("long").as("_2"),
          col("user_id").cast("string").as("_3"),
          (col("conv") === 1).as("_4"))
      val snapshots = PackShared.drainStaged(s, staged, "q260_sink", "q260-users")(
        in => graft.streaming.StreamingSrmMonitor
          .counts(in.as[(Int, Long, String, Boolean)], salt = "exp1")
          .toDF("shard", "epoch", "n_a", "n_b", "conv_a", "conv_b"))
      graft.streaming.StreamingSrmMonitor.readout(snapshots)
    }),

    // q259 with the PERSISTENCE leg: each vintage's moment partial is
    // APPENDED as an IndexStore generation (the q139 metrics-store
    // lifecycle), the readout merges the generations read back from disk
    // — daily experiment vintages consolidate without ever rescanning
    // history, and the Welch readout must still be bit-identical to the
    // from-scratch oracle (decimal partials survive the parquet
    // roundtrip exactly).
    "q261_vintage_store_welch" -> ((s, d) => {
      val armed = Sampling.hashSplit(
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderdate"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents")),
        "o_custkey", Seq("a" -> 0.5, "b" -> 0.5), "exp2")
      val cut = lit("1995-01-01").cast("timestamp")
      val tmp = java.nio.file.Files.createTempDirectory("graft-q261-moments").toString
      val dir = tmp + "/store"
      try {
        Seq(armed.filter(col("o_orderdate") < cut),
          armed.filter(col("o_orderdate") >= cut))
          .foreach(v => graft.sinks.IndexStore.append(
            graft.operators.Inference.momentPartial(v, Seq("split"), "cents",
              decimalScale = 0), dir))
        // localCheckpoint materializes the tiny merged partials so the store
        // dir can be deleted before return (min-of-N bench re-runs would
        // otherwise accrete one store per run in /tmp)
        graft.operators.Inference.welchFromMoments(
          graft.operators.Inference.momentMerge(
            Seq(graft.sinks.IndexStore.read(s, dir).localCheckpoint(true)), Seq("split")),
          "split", "a", "b")
      } finally PackShared.deleteRecursively(tmp)
    }),

    // A/B readout with the SRM guard: users hash-assigned 50/50, per-arm
    // purchase conversion, pooled two-proportion z, and the
    // sample-ratio-mismatch z every experiment page must check FIRST.
    "q230_ab_readout" -> ((s, d) => {
      val users = Tables.events(s, d).groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"))
      graft.operators.Experiment.abReadout(users, "user_id", "converted", salt = "exp1")
    }),

    // Experiment PLANNING: two-proportion sample-size analysis per user
    // cohort — observed base conversion rates (1e-6-quantized so both
    // engines feed the closed form identical inputs), a 3-point MDE
    // grid, shared z literals; the "how long must this test run" readout
    // that precedes every q230.
    "q264_power_analysis" -> ((s, d) => {
      val users = Tables.events(s, d).groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"))
        .withColumn("cohort", pmod(col("user_id"), lit(4L)))
      graft.operators.Experiment.powerAnalysis(users, Seq("cohort"),
        "user_id", "converted", mdes = Seq(0.01, 0.02, 0.05))
        .orderBy(col("cohort"), col("mde"))
    }),

    // Always-valid sequential readout (mSPRT): the q230 experiment under
    // an enrollment-accrual peeking schedule — users enter at their first-
    // event HOUR, each hour is a cut of cumulative per-arm counts, and the
    // mixture-LR p is valid at EVERY cut simultaneously (the reason a
    // continuously-watched experiment can't use fixed-n z). τ² = 1e-4.
    "q265_msprt" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // conversion = heavy purchaser (≥14 purchase events): EVERY user in
      // this corpus purchases at least once, so the binary any-purchase
      // rate is a degenerate 1.0 (se² = 0, all cuts null) — the threshold
      // form sits mid-range at every SF (8/15 at sf0.001, 69/150 at
      // sf0.01, 697/1500 at sf0.1)
      val users = Tables.events(s, d).filter(col("ts").isNotNull)
        .groupBy(col("user_id"))
        .agg(when(count(when(col("event_type") === "purchase", 1)) >= 14, 1)
          .otherwise(0).as("conv"),
          min(unix_micros(col("ts"))).as("__entry_us"))
      val assigned = Sampling.hashSplit(users, "user_id",
        Seq("a" -> 0.5, "b" -> 0.5), "exp1")
        // exact integer hour index — both engines divide the same longs
        .withColumn("cut", expr("__entry_us DIV 3600000000"))
      val perDay = assigned.groupBy(col("cut"))
        .agg(count(when(col("split") === "a", 1)).as("__da"),
          count(when(col("split") === "b", 1)).as("__db"),
          count(when(col("split") === "a" && col("conv") === 1, 1)).as("__ca"),
          count(when(col("split") === "b" && col("conv") === 1, 1)).as("__cb"))
      // UNPARTITIONED-WINDOW: bounded by the analysis-cut count (one
      // row per monitoring day)
      val w = Window.orderBy(col("cut"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cuts = perDay.select(col("cut"),
        sum(col("__da")).over(w).as("n_a"), sum(col("__db")).over(w).as("n_b"),
        sum(col("__ca")).over(w).as("conv_a"), sum(col("__cb")).over(w).as("conv_b"))
      graft.operators.Experiment.msprtReadout(cuts, "cut", tau2 = 0.0001)
        .orderBy(col("cut"))
    }),

    // q265's CONTINUOUS sibling: always-valid sequential readout for a
    // MEAN metric (order value in whole dollars — integral, so the
    // per-arm (n, Σx, Σx²) moment cuts are exact decimal sums). Cuts are
    // order YEARS of cumulative moments; Welch/unpooled se² of the mean
    // difference feeds the same mixture-LR machinery; A/A split (hash
    // halves, no real effect) so p stays off the floor. τ² = 1e6
    // (dollar-scale effect mixture).
    "q276_msprt_mean" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val orders = Tables.orders(s, d).select(col("o_custkey"), col("o_orderdate"),
        floor(col("o_totalprice")).cast("long").as("dollars"))
      val assigned = Sampling.hashSplit(orders, "o_custkey",
        Seq("a" -> 0.5, "b" -> 0.5), "exp1")
        .withColumn("cut", year(col("o_orderdate")).cast("long"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val perCut = assigned.groupBy(col("cut"))
        .agg(count(when(col("split") === "a", 1)).as("__da"),
          count(when(col("split") === "b", 1)).as("__db"),
          sum(when(col("split") === "a", dec(col("dollars")))).as("__sa"),
          sum(when(col("split") === "b", dec(col("dollars")))).as("__sb"),
          sum(when(col("split") === "a", dec(col("dollars") * col("dollars")))).as("__qa"),
          sum(when(col("split") === "b", dec(col("dollars") * col("dollars")))).as("__qb"))
      // UNPARTITIONED-WINDOW: bounded by the analysis-cut count (one
      // row per monitoring day)
      val w = Window.orderBy(col("cut"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cuts = perCut.select(col("cut"),
        sum(col("__da")).over(w).as("n_a"), sum(col("__db")).over(w).as("n_b"),
        sum(col("__sa")).over(w).as("sum_a"), sum(col("__sb")).over(w).as("sum_b"),
        sum(col("__qa")).over(w).as("sumsq_a"), sum(col("__qb")).over(w).as("sumsq_b"))
      graft.operators.Experiment.msprtMeanReadout(cuts, "cut", tau2 = 1000000.0)
        .orderBy(col("cut"))
    }),

    // q264's CONTINUOUS sibling: sample-size planning for a MEAN test —
    // per-returnflag lineitem quantity variance off exact integral
    // moments (quantized pre-closed-form), a 3-point absolute-MDE grid,
    // the shared z literals.
    "q277_power_mean" -> ((s, d) =>
      graft.operators.Experiment.powerAnalysisMean(
        Tables.lineitem(s, d).select(col("l_returnflag"),
          col("l_quantity").cast("long").as("qty")),
        Seq("l_returnflag"), "qty", mdes = Seq(0.5, 1.0, 2.0))
        .orderBy(col("l_returnflag"), col("mde"))),

    // q261's CONTINUOUS-MONITOR form driven for real: order values
    // (whole dollars — the monitor's Σx²-fits-a-long unit rule) drained
    // through the per-shard per-arm moment fold (O(1) state forever),
    // max-epoch snapshots long-summed and finished through the SHARED
    // welchFromMoments closed form — the readout must be bit-identical
    // to the from-scratch Welch SQL oracle over the same orders.
    "q278_streaming_welch" -> ((s, d) => {
      import s.implicits._
      val staged = Tables.orders(s, d).select(
        pmod(col("o_custkey"), lit(4)).cast("int").as("_1"),
        col("o_orderkey").cast("long").as("_2"),
        col("o_custkey").cast("string").as("_3"),
        floor(col("o_totalprice")).cast("long").as("_4"))
      val snaps = PackShared.drainStaged(s, staged, "q278_sink", "q278-orders")(
        in => graft.streaming.StreamingMeanMonitor
          .moments(in.as[(Int, Long, String, Long)], salt = "exp2")
          .toDF("shard", "epoch", "n_a", "sum_a", "sumsq_a",
            "n_b", "sum_b", "sumsq_b"))
      graft.streaming.StreamingMeanMonitor.welchReadout(snaps)
    }),

    // Bradley–Terry preference fit over planted duels: each user's
    // per-event-type activity counts generate pairwise "preferences"
    // (the more-active type wins, ties skip), and the MM fixed point
    // recovers a global strength ranking. The oracle replays every
    // iteration on the integer nano-grid (the HITS-unroll discipline) —
    // the whole fit is engine-exact, so one drifted floor/normalize
    // step anywhere in 8 iterations fails the hash gate.
    "q279_bradley_terry" -> ((s, d) => {
      val perUser = Tables.events(s, d).groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val a = perUser.as("a"); val b = perUser.as("b")
      val duels = a.join(b,
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .filter(col("a.cnt") =!= col("b.cnt"))
        .select(
          when(col("a.cnt") > col("b.cnt"), col("a.event_type"))
            .otherwise(col("b.event_type")).as("winner"),
          when(col("a.cnt") > col("b.cnt"), col("b.event_type"))
            .otherwise(col("a.event_type")).as("loser"))
      graft.operators.Experiment.bradleyTerry(duels, "winner", "loser", iterations = 8)
        .orderBy(col("item"))
    }),

    // q279's CONTINUOUS form driven for real: the same planted duels
    // drained through the per-shard pair-count fold (pairs-bounded state
    // forever), max-epoch snapshots long-summed per pair, and the SHARED
    // MM fixed point run on the merged table — the drained fit must be
    // bit-identical to q279's unrolled-MM SQL oracle over the same duels.
    "q297_streaming_bradley_terry" -> ((s, d) => {
      import s.implicits._
      val perUser = Tables.events(s, d).groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val a = perUser.as("a"); val b = perUser.as("b")
      val staged = a.join(b,
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .filter(col("a.cnt") =!= col("b.cnt"))
        .select(
          pmod(col("a.user_id"), lit(3)).cast("int").as("_1"),
          col("a.user_id").cast("long").as("_2"),
          when(col("a.cnt") > col("b.cnt"), col("a.event_type"))
            .otherwise(col("b.event_type")).cast("string").as("_3"),
          when(col("a.cnt") > col("b.cnt"), col("b.event_type"))
            .otherwise(col("a.event_type")).cast("string").as("_4"))
      val snaps = PackShared.drainStaged(s, staged, "q297_sink", "q297-duels")(
        in => graft.streaming.StreamingBradleyTerry
          .pairCounts(in.as[(Int, Long, String, String)])
          .toDF("shard", "epoch", "winner", "loser", "n"))
      graft.streaming.StreamingBradleyTerry.fitFromDrained(snaps, iterations = 8)
        .orderBy(col("item"))
    }),

    // q297 KILLED AND RESUMED mid-corpus (r15 verdict #2): the same duel
    // stream drained as two queries over one checkpoint — leg 1 stops
    // after half the files, leg 2 is a fresh query instance that must
    // recover the per-shard (epoch, pair-count) state from the state
    // store and the seen-file set from the source log. The resumed fit
    // answers to q279's exact unrolled-MM oracle: restart must be
    // invisible in the readout (the reference's resumable run-loop
    // contract, tamer/Tamer.scala:108-148).
    "q333_bt_restart" -> ((s, d) => {
      import s.implicits._
      val perUser = Tables.events(s, d).groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val a = perUser.as("a"); val b = perUser.as("b")
      val staged = a.join(b,
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .filter(col("a.cnt") =!= col("b.cnt"))
        .select(
          pmod(col("a.user_id"), lit(3)).cast("int").as("_1"),
          col("a.user_id").cast("long").as("_2"),
          when(col("a.cnt") > col("b.cnt"), col("a.event_type"))
            .otherwise(col("b.event_type")).cast("string").as("_3"),
          when(col("a.cnt") > col("b.cnt"), col("b.event_type"))
            .otherwise(col("a.event_type")).cast("string").as("_4"))
      val snaps = PackShared.drainStagedResumed(s, staged, "q333-bt-restart")(
        in => graft.streaming.StreamingBradleyTerry
          .pairCounts(in.as[(Int, Long, String, String)])
          .toDF("shard", "epoch", "winner", "loser", "n"))
      graft.streaming.StreamingBradleyTerry.fitFromDrained(snaps, iterations = 8)
        .orderBy(col("item"))
    }),

    // Position-bias audit over the q279 duel stream: "first" is the
    // alphabetically-earlier type (the join's presentation slot), and
    // the exact binomial z says whether slot-one wins depart from the
    // fair coin — the first QC gate on any A/B annotation stream.
    "q280_position_bias" -> ((s, d) => {
      val perUser = Tables.events(s, d).groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val a = perUser.as("a"); val b = perUser.as("b")
      // SMJ-pinned: both sides are the users-shaped aggregate — a derived
      // broadcast here only looks safe at test SF (the q64 discipline)
      val duels = a.join(b.hint("shuffle_merge"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .filter(col("a.cnt") =!= col("b.cnt"))
        .select(
          when(col("a.cnt") > col("b.cnt"), col("a.event_type"))
            .otherwise(col("b.event_type")).as("winner"),
          col("a.event_type").as("first"))
      graft.operators.Experiment.positionBias(duels, "winner", "first")
    }),

    // Transitivity audit over the same duels: majority-vote each pair,
    // count circular triads among fully-decided triples — whether a
    // global ranking (q279's model) even exists for this data.
    "q281_transitivity" -> ((s, d) => {
      val perUser = Tables.events(s, d).groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val a = perUser.as("a"); val b = perUser.as("b")
      val duels = a.join(b,
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .filter(col("a.cnt") =!= col("b.cnt"))
        .select(
          when(col("a.cnt") > col("b.cnt"), col("a.event_type"))
            .otherwise(col("b.event_type")).as("winner"),
          when(col("a.cnt") > col("b.cnt"), col("b.event_type"))
            .otherwise(col("a.event_type")).as("loser"))
      graft.operators.Experiment.transitivityAudit(duels, "winner", "loser")
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
  )

  def oracles: Map[String, String] = Map(

    // q230/q231/q235: generated — hashSplit boundary / quantile /
    // permutation-coin mirrors.
    "q230_ab_readout" -> abReadoutOracle,
    // q260 drains the SAME users through the streaming fold — by the
    // drain≡batch contract its oracle IS q230's.
    "q260_streaming_srm" -> abReadoutOracle,
    "q259_vintage_welch" -> vintageWelchOracle,
    // q261 merges the SAME vintage partials read back from the generation
    // store — by the decimal-partial contract its oracle IS q259's.
    "q261_vintage_store_welch" -> vintageWelchOracle,
    // q278: the drained monitor's readout vs Welch-from-scratch on the
    // whole-dollar metric — drain ≡ batch under the hash gate.
    "q278_streaming_welch" -> PackShared.streamingWelchOracle,

    // q279: the full MM iteration unrolled on the integer nano-grid.
    "q279_bradley_terry" -> PackShared.bradleyTerryCtes(
      """SELECT CASE WHEN a.cnt > b.cnt THEN a.event_type ELSE b.event_type END AS w,
                CASE WHEN a.cnt > b.cnt THEN b.event_type ELSE a.event_type END AS l
         FROM (SELECT user_id, event_type, count(*) AS cnt
               FROM events GROUP BY user_id, event_type) a
         JOIN (SELECT user_id, event_type, count(*) AS cnt
               FROM events GROUP BY user_id, event_type) b
           ON a.user_id = b.user_id AND a.event_type < b.event_type
         WHERE a.cnt <> b.cnt""", iterations = 8),

    // q297: drain ≡ batch — the merged pair counts equal the batch
    // groupBy, so the drained fit answers to q279's exact oracle.
    "q297_streaming_bradley_terry" -> PackShared.bradleyTerryCtes(
      """SELECT CASE WHEN a.cnt > b.cnt THEN a.event_type ELSE b.event_type END AS w,
                CASE WHEN a.cnt > b.cnt THEN b.event_type ELSE a.event_type END AS l
         FROM (SELECT user_id, event_type, count(*) AS cnt
               FROM events GROUP BY user_id, event_type) a
         JOIN (SELECT user_id, event_type, count(*) AS cnt
               FROM events GROUP BY user_id, event_type) b
           ON a.user_id = b.user_id AND a.event_type < b.event_type
         WHERE a.cnt <> b.cnt""", iterations = 8),
    // q333: restart-invisibility — the resumed drain's merged counts
    // equal the batch groupBy, so the fit answers to q279's oracle too.
    "q333_bt_restart" -> PackShared.bradleyTerryCtes(
      """SELECT CASE WHEN a.cnt > b.cnt THEN a.event_type ELSE b.event_type END AS w,
                CASE WHEN a.cnt > b.cnt THEN b.event_type ELSE a.event_type END AS l
         FROM (SELECT user_id, event_type, count(*) AS cnt
               FROM events GROUP BY user_id, event_type) a
         JOIN (SELECT user_id, event_type, count(*) AS cnt
               FROM events GROUP BY user_id, event_type) b
           ON a.user_id = b.user_id AND a.event_type < b.event_type
         WHERE a.cnt <> b.cnt""", iterations = 8),
    "q235_permutation_test" -> permutationOracle,
    "q246_raking" -> rakingOracle,
    "q248_experiment_scorecard" -> scorecardOracle,
    "q251_fdr_segments" -> fdrSegmentsOracle,
    "q252_qte" -> qteOracle,
    "q253_log_rank" -> logRankOracle,

    // q265: hashSplit boundary literal, cumulative window cuts, the
    // mixture-LR closed form with ln/exp on the q172 quantize-after
    // convention, running-min p off the QUANTIZED log Λ.
    "q265_msprt" -> {
      val b = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
      val h = PackShared.duckKeyHash("user_id", "exp1")
      s"""
      WITH u AS (SELECT user_id,
                        CASE WHEN count(*) FILTER (WHERE event_type = 'purchase') >= 14
                             THEN 1 ELSE 0 END AS conv,
                        min(epoch_us(ts)) AS entry_us
                 FROM events WHERE ts IS NOT NULL GROUP BY user_id),
      asg AS (SELECT conv,
                     CAST(entry_us // 3600000000 AS BIGINT) AS cut,
                     CASE WHEN $h < $b THEN 'a' ELSE 'b' END AS split
              FROM u),
      pd AS (SELECT cut,
                    CAST(count(*) FILTER (WHERE split = 'a') AS BIGINT) AS da,
                    CAST(count(*) FILTER (WHERE split = 'b') AS BIGINT) AS db,
                    CAST(count(*) FILTER (WHERE split = 'a' AND conv = 1) AS BIGINT) AS ca,
                    CAST(count(*) FILTER (WHERE split = 'b' AND conv = 1) AS BIGINT) AS cb
             FROM asg GROUP BY cut),
      cuts AS (SELECT cut,
                      CAST(sum(da) OVER w AS BIGINT) AS n_a,
                      CAST(sum(db) OVER w AS BIGINT) AS n_b,
                      CAST(sum(ca) OVER w AS BIGINT) AS conv_a,
                      CAST(sum(cb) OVER w AS BIGINT) AS conv_b
               FROM pd
               WINDOW w AS (ORDER BY cut ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      base AS (SELECT cut, n_a, n_b,
                      CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                        - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS diff,
                      CAST(conv_a + conv_b AS DOUBLE)
                        / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pooled
               FROM cuts),
      se AS (SELECT cut, n_a, n_b, diff,
                    pooled * (CAST(1.0 AS DOUBLE) - pooled)
                      * (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE)
                         + CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE)) AS se2
             FROM base),
      ll AS (SELECT cut, n_a, n_b,
                    CASE WHEN n_a >= 1 AND n_b >= 1 AND se2 > CAST(0.0 AS DOUBLE)
                         THEN CAST(floor(diff * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
                    END AS diff,
                    CASE WHEN n_a >= 1 AND n_b >= 1 AND se2 > CAST(0.0 AS DOUBLE)
                         THEN CAST(floor((CAST(0.5 AS DOUBLE)
                                * ln(se2 / (se2 + CAST(0.0001 AS DOUBLE)))
                              + diff * diff * CAST(0.0001 AS DOUBLE)
                                / (CAST(2.0 AS DOUBLE) * se2
                                   * (se2 + CAST(0.0001 AS DOUBLE))))
                              * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
                    END AS log_lambda
             FROM se)
      SELECT cut, n_a, n_b, diff, log_lambda,
             CAST(floor(coalesce(
                 min(CASE WHEN log_lambda IS NOT NULL
                          THEN least(CAST(1.0 AS DOUBLE), exp(-log_lambda)) END)
                   OVER (ORDER BY cut ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 CAST(1.0 AS DOUBLE)) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
               AS p_always
      FROM ll ORDER BY cut"""
    },

    // q276: the mean-metric mixture-LR closed form — exact HUGEINT
    // moment sums cast to double, Welch se², same quantize-after-ln/exp
    // discipline and running-min p as q265.
    "q276_msprt_mean" -> {
      val b = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
      val h = PackShared.duckKeyHash("o_custkey", "exp1")
      s"""
      WITH o AS (SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS cut,
                        CAST(floor(o_totalprice) AS BIGINT) AS dollars
                 FROM orders),
      asg AS (SELECT cut, dollars,
                     CASE WHEN $h < $b THEN 'a' ELSE 'b' END AS split
              FROM o),
      pd AS (SELECT cut,
                    CAST(count(*) FILTER (WHERE split = 'a') AS BIGINT) AS da,
                    CAST(count(*) FILTER (WHERE split = 'b') AS BIGINT) AS db,
                    sum(CASE WHEN split = 'a' THEN dollars END) AS sa,
                    sum(CASE WHEN split = 'b' THEN dollars END) AS sb,
                    sum(CASE WHEN split = 'a' THEN dollars * dollars END) AS qa,
                    sum(CASE WHEN split = 'b' THEN dollars * dollars END) AS qb
             FROM asg GROUP BY cut),
      cuts AS (SELECT cut,
                      CAST(sum(da) OVER w AS BIGINT) AS n_a,
                      CAST(sum(db) OVER w AS BIGINT) AS n_b,
                      sum(sa) OVER w AS sum_a,
                      sum(sb) OVER w AS sum_b,
                      sum(qa) OVER w AS sumsq_a,
                      sum(qb) OVER w AS sumsq_b
               FROM pd
               WINDOW w AS (ORDER BY cut ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      mn AS (SELECT cut, n_a, n_b, sumsq_a, sumsq_b,
                    CAST(sum_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
                    CAST(sum_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb
             FROM cuts),
      vr AS (SELECT cut, n_a, n_b, mb - ma AS diff,
                    (CAST(sumsq_a AS DOUBLE) - CAST(n_a AS DOUBLE) * ma * ma)
                      / (CAST(n_a AS DOUBLE) - CAST(1.0 AS DOUBLE)) AS va,
                    (CAST(sumsq_b AS DOUBLE) - CAST(n_b AS DOUBLE) * mb * mb)
                      / (CAST(n_b AS DOUBLE) - CAST(1.0 AS DOUBLE)) AS vb
             FROM mn),
      se AS (SELECT cut, n_a, n_b, diff,
                    va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE) AS se2
             FROM vr),
      ll AS (SELECT cut, n_a, n_b,
                    CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > CAST(0.0 AS DOUBLE)
                         THEN CAST(floor(diff * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
                    END AS diff,
                    CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > CAST(0.0 AS DOUBLE)
                         THEN CAST(floor((CAST(0.5 AS DOUBLE)
                                * ln(se2 / (se2 + CAST(1000000.0 AS DOUBLE)))
                              + diff * diff * CAST(1000000.0 AS DOUBLE)
                                / (CAST(2.0 AS DOUBLE) * se2
                                   * (se2 + CAST(1000000.0 AS DOUBLE))))
                              * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
                    END AS log_lambda
             FROM se)
      SELECT cut, n_a, n_b, diff, log_lambda,
             CAST(floor(coalesce(
                 min(CASE WHEN log_lambda IS NOT NULL
                          THEN least(CAST(1.0 AS DOUBLE), exp(-log_lambda)) END)
                   OVER (ORDER BY cut ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 CAST(1.0 AS DOUBLE)) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
               AS p_always
      FROM ll ORDER BY cut"""
    },

    // q277: variance off exact moments quantized pre-closed-form; the
    // closed form in the operator's exact op order with the shared z
    // literals, every constant cast to DOUBLE.
    "q277_power_mean" -> """
      WITH q AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty
                 FROM lineitem),
      s AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                   sum(qty) AS s1, sum(qty * qty) AS s2
            FROM q GROUP BY l_returnflag),
      mn AS (SELECT l_returnflag, n, s2,
                    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m
             FROM s),
      v AS (SELECT l_returnflag,
                   CASE WHEN n >= 2 THEN CAST(floor(
                     ((CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE) * m * m)
                      / (CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE)))
                     * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
                   END AS variance
            FROM mn),
      md AS (SELECT CAST(unnest([0.5, 1.0, 2.0]) AS DOUBLE) AS mde)
      SELECT l_returnflag, variance, mde,
             CAST(floor(CAST(2.0 AS DOUBLE)
                  * (CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE))
                  * (CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE))
                  * variance / (mde * mde) * 1000000.0 + 0.5) AS DOUBLE)
               / 1000000.0 AS n_per_arm
      FROM v CROSS JOIN md ORDER BY l_returnflag, mde""",

    // q280: exact integer counts into the binomial closed form on the
    // 1e-6 grid.
    "q280_position_bias" -> """
      WITH pu AS (SELECT user_id, event_type, count(*) AS cnt
                  FROM events GROUP BY user_id, event_type),
      dd AS (SELECT CASE WHEN a.cnt > b.cnt THEN a.event_type
                         ELSE b.event_type END AS w,
                    a.event_type AS f
             FROM pu a JOIN pu b
               ON a.user_id = b.user_id AND a.event_type < b.event_type
             WHERE a.cnt <> b.cnt),
      c AS (SELECT CAST(count(*) AS BIGINT) AS n_duels,
                   CAST(count(*) FILTER (WHERE w = f) AS BIGINT) AS first_wins
            FROM dd)
      SELECT n_duels, first_wins,
             CASE WHEN n_duels >= 1
                  THEN CAST(floor(CAST(first_wins AS DOUBLE)
                       / CAST(n_duels AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
                       / 1000000.0
             END AS first_rate,
             CASE WHEN n_duels >= 1
                  THEN CAST(floor((CAST(2.0 AS DOUBLE) * CAST(first_wins AS DOUBLE)
                         - CAST(n_duels AS DOUBLE))
                       / sqrt(CAST(n_duels AS DOUBLE)) * 1000000.0 + 0.5) AS DOUBLE)
                       / 1000000.0
             END AS z_position
      FROM c""",

    // q281: majority digraph + triad counting in exact integers; the
    // cycle anchor rule (least item) mirrored.
    "q281_transitivity" -> """
      WITH pu AS (SELECT user_id, event_type, count(*) AS cnt
                  FROM events GROUP BY user_id, event_type),
      dd AS (SELECT CASE WHEN a.cnt > b.cnt THEN a.event_type
                         ELSE b.event_type END AS w,
                    CASE WHEN a.cnt > b.cnt THEN b.event_type
                         ELSE a.event_type END AS l
             FROM pu a JOIN pu b
               ON a.user_id = b.user_id AND a.event_type < b.event_type
             WHERE a.cnt <> b.cnt),
      oc AS MATERIALIZED (SELECT w, l, CAST(count(*) AS BIGINT) AS n
                          FROM dd GROUP BY w, l),
      pr AS (SELECT least(w, l) AS a, greatest(w, l) AS b,
                    sum(CASE WHEN w = least(w, l) THEN n ELSE 0 END) AS ab,
                    sum(CASE WHEN w = greatest(w, l) THEN n ELSE 0 END) AS ba
             FROM oc GROUP BY least(w, l), greatest(w, l)),
      decided AS MATERIALIZED (
        SELECT CASE WHEN ab > ba THEN a ELSE b END AS src,
               CASE WHEN ab > ba THEN b ELSE a END AS dst
        FROM pr WHERE ab <> ba),
      und AS MATERIALIZED (SELECT least(src, dst) AS a, greatest(src, dst) AS b
                           FROM decided),
      tri AS (SELECT CAST(count(*) AS BIGINT) AS decided_triads
              FROM und ij JOIN und jk ON ij.b = jk.a
              JOIN und ik ON ik.a = ij.a AND ik.b = jk.b),
      cyc AS (SELECT CAST(count(*) AS BIGINT) AS circular_triads
              FROM decided e1
              JOIN decided e2 ON e1.dst = e2.src
              JOIN decided e3 ON e2.dst = e3.src AND e3.dst = e1.src
              WHERE e1.src < e2.src AND e1.src < e3.src),
      it AS (SELECT CAST(count(DISTINCT item) AS BIGINT) AS items
             FROM (SELECT w AS item FROM oc UNION SELECT l FROM oc)),
      dp AS (SELECT CAST(count(*) AS BIGINT) AS decided_pairs FROM decided)
      SELECT items, decided_pairs, decided_triads, circular_triads,
             CASE WHEN decided_triads >= 1
                  THEN CAST(floor(CAST(circular_triads AS DOUBLE)
                       / CAST(decided_triads AS DOUBLE) * 1000000.0 + 0.5)
                       AS DOUBLE) / 1000000.0
             END AS circular_share
      FROM it CROSS JOIN dp CROSS JOIN tri CROSS JOIN cyc""",

    // q264: base rates quantized BEFORE the closed form, z constants =
    // the operator's shared literals, every float op mirrored in the
    // same order and in DOUBLE (DuckDB numeric literals default to
    // DECIMAL — every constant is cast explicitly).
    "q264_power_analysis" -> s"""
      WITH u AS (SELECT user_id, user_id % 4 AS cohort,
                        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
                 FROM events GROUP BY user_id),
      r AS (SELECT cohort,
                   CAST(floor(CAST(count(*) FILTER (WHERE conv = 1) AS DOUBLE)
                        / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
                     / 1000000.0 AS base_rate
            FROM u GROUP BY cohort),
      m AS (SELECT CAST(unnest([0.01, 0.02, 0.05]) AS DOUBLE) AS mde),
      g AS (SELECT cohort, base_rate, mde,
                   base_rate AS p1,
                   base_rate + mde AS p2,
                   (base_rate + (base_rate + mde)) / CAST(2.0 AS DOUBLE) AS pbar
            FROM r CROSS JOIN m),
      n AS (SELECT cohort, base_rate, mde, p2,
                   CASE WHEN p2 < CAST(1.0 AS DOUBLE) THEN
                     CAST(1.959964 AS DOUBLE)
                       * sqrt(CAST(2.0 AS DOUBLE) * pbar * (CAST(1.0 AS DOUBLE) - pbar))
                     + CAST(0.841621 AS DOUBLE)
                       * sqrt(p1 * (CAST(1.0 AS DOUBLE) - p1)
                              + p2 * (CAST(1.0 AS DOUBLE) - p2))
                   END AS num
            FROM g)
      SELECT cohort, base_rate, mde,
             CASE WHEN p2 < CAST(1.0 AS DOUBLE)
                  THEN CAST(floor(num * num / (mde * mde) * 1000000.0 + 0.5) AS DOUBLE)
                       / 1000000.0
             END AS n_per_arm
      FROM n ORDER BY cohort, mde""",

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
  )
}
