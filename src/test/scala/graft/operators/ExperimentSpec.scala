package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExperimentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("abReadout: formulas reconstruct from the exact arm counts; healthy assignment passes SRM") {
    val users = (1L to 1000L).map(i => (i, i % 5 == 0L)).toDF("uid", "conv")
    val r = Experiment.abReadout(users, "uid", "conv", salt = "t1").head()
    val (na, nb) = (r.getLong(0), r.getLong(1))
    val (ca, cb) = (r.getLong(2), r.getLong(3))
    assert(na + nb == 1000L && ca + cb == 200L)
    def q6(x: Double) = graft.functions.Quantize.scaledFloorDouble(x, 6)
    val (ra, rb) = (ca.toDouble / na, cb.toDouble / nb)
    assert(r.getDouble(4) == q6(ra) && r.getDouble(5) == q6(rb))
    assert(r.getDouble(6) == q6((rb - ra) / ra))
    val pooled = (ca + cb).toDouble / (na + nb)
    assert(r.getDouble(7) == q6((rb - ra) /
      math.sqrt(pooled * (1 - pooled) * (1.0 / na + 1.0 / nb))))
    val zs = (na - 1000 * 0.5) / math.sqrt(1000 * 0.25)
    assert(r.getDouble(8) == q6(zs))
    // a 2^60-grid 50/50 hash over 1000 uids lands well inside |z| < 3
    assert(!r.getBoolean(9))
  }

  test("abReadout: an arm-selective upstream loss trips the SRM flag before anyone reads the metric") {
    val users = (1L to 2000L).map(i => (i, false)).toDF("uid", "conv")
    // simulate a pipeline that loses 90% of arm-b users: keep arm-a
    // (same salt, same boundary) and only every 10th of the rest
    val boundary = Sampling.splitBoundaries(Seq("a" -> 0.5, "b" -> 0.5)).head._2
    val kept = users.filter(
      Sampling.keyHash(col("uid"), "t2") < lit(boundary) || col("uid") % 10 === 0)
    val r = Experiment.abReadout(kept, "uid", "conv", salt = "t2").head()
    assert(r.getBoolean(9), s"SRM must fire at z=${r.getDouble(8)}")
    // degenerate metric: zero conversions -> lift and z_conv null
    assert(r.isNullAt(6) && r.isNullAt(7))
    intercept[IllegalArgumentException] {
      Experiment.abReadout(users, "uid", "conv", salt = "t3", pA = 1.0)
    }
  }

  test("permutationTest: a planted effect pins p at the add-one floor; a null effect doesn't") {
    // arm a = 0, arm b = 100 for 200 users each: no pseudo-assignment can
    // reproduce a 100-point diff, so p = (1 + 0)/(reps + 1)
    val planted = ((1L to 200L).map(i => (i, "a", 0L)) ++
      (201L to 400L).map(i => (i, "b", 100L))).toDF("uid", "arm", "v")
    val r = Experiment.permutationTest(planted, "uid", "arm", "v",
      reps = 200, salt = "pt1").head()
    assert(r.getLong(0) == 200L && r.getLong(1) == 200L)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 100.0 && r.getDouble(4) == 100.0)
    assert(r.getLong(5) == 200L)
    assert(r.getDouble(6) == graft.functions.Quantize.scaledFloorDouble(1.0 / 201.0, 6))
    // arm labels carry no signal: the same metric in both arms -> p large
    val nul = (1L to 400L).map(i => (i, if (i % 2 == 0) "a" else "b", i % 7))
      .toDF("uid", "arm", "v")
    val n = Experiment.permutationTest(nul, "uid", "arm", "v",
      reps = 100, salt = "pt2").head()
    assert(n.getDouble(6) > 0.2, s"null effect p=${n.getDouble(6)} should be large")
    intercept[IllegalArgumentException] {
      Experiment.permutationTest(
        nul.withColumn("v", col("v").cast("double")), "uid", "arm", "v", 100, "pt3")
    }
  }

  test("cuped: a perfectly predictive covariate removes ALL variance; degenerate sides null") {
    val lin = (1L to 4L).map(x => (x, 2 * x + 3)).toDF("pre", "post")
    val r = Experiment.cuped(lin, "pre", "post").head()
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 2.0)        // theta = cov/var = slope
    assert(r.getDouble(3) == 0.0)        // var_adj
    assert(r.getDouble(4) == 1.0)        // rho^2
    val constPost = (1L to 4L).map(x => (x, 7L)).toDF("pre", "post")
    val cp = Experiment.cuped(constPost, "pre", "post").head()
    assert(cp.getDouble(1) == 0.0 && cp.isNullAt(4)) // var_y = 0: reduction undefined
    val constPre = (1L to 4L).map(x => (7L, x)).toDF("pre", "post")
    val cx = Experiment.cuped(constPre, "pre", "post").head()
    assert(cx.isNullAt(1) && cx.isNullAt(3) && cx.isNullAt(4))
  }

  test("reconcile: clean keys silent; mismatch/missing classes exact") {
    val a = Seq((1L, 10.0), (2L, 5.0), (3L, 7.0)).toDF("k", "v")
    val b = Seq((1L, 10.0), (2L, 6.0), (4L, 2.0)).toDF("k", "v")
    val got = Profiler.reconcile(a, "k", "v", b, "k", "v")
      .orderBy("key").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getString(4)))).toMap
    assert(got == Map(2L -> ((-1.0, "mismatch")), 3L -> ((7.0, "missing_b")),
      4L -> ((-2.0, "missing_a"))))
    // identical sides certify with an EMPTY result
    assert(Profiler.reconcile(a, "k", "v", a, "k", "v").count() == 0L)
  }

  test("kAnonymityAudit: group sizes and sensitive diversity against the k/l bars") {
    val rows = (Seq.fill(2)(("g1", "s1")) ++ Seq.fill(2)(("g1", "s2")) ++
      Seq.fill(2)(("g1", "s3")) ++ Seq.fill(2)(("g2", "sX")))
      .toDF("qi", "sens")
    val r = Profiler.kAnonymityAudit(rows, Seq("qi"), "sens", k = 5, l = 3).head()
    assert(r.getLong(0) == 8L && r.getLong(1) == 2L)   // n_rows, n_groups
    assert(r.getLong(2) == 2L)                          // min group (g2)
    assert(r.getLong(3) == 1L && r.getLong(4) == 2L)    // g2 below k, its 2 rows
    assert(r.getLong(5) == 1L && r.getLong(6) == 1L)    // g2 has 1 sensitive value
  }

  test("rfm: quintile scores land 1-5 on a clean staircase; recency inverts") {
    val events = (1 to 5).flatMap { u =>
      (1 to u * 10).map(_ => (u.toLong, "2024-01-05 10:00:00", 1L))
    }.toDF("uid", "s", "amount")
      .select(col("uid"), col("s").cast("timestamp").as("ts"), col("amount"))
    val got = Funnel.rfm(events, "uid", "ts", "amount")
      .orderBy("uid").collect()
    // frequencies 10..50 against cuts (18, 26, 34, 42) -> scores 1..5;
    // monetary == frequency -> same; recency all 0 -> everyone 5
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(1) == 0) // recency
      assert(r.getLong(2) == (i + 1) * 10L && r.getLong(3) == (i + 1) * 10L)
      assert(r.getInt(4) == 5 && r.getInt(5) == i + 1 && r.getInt(6) == i + 1)
      assert(r.getString(7) == s"5${i + 1}${i + 1}")
    }
    intercept[IllegalArgumentException] { // float monetary refused
      Funnel.rfm(events.withColumn("amount", col("amount").cast("double")),
        "uid", "ts", "amount")
    }
  }

  test("matchedOutcomes: nearest-control match, hand-computed ATT") {
    // controls: (id1, s=1, y=10), (id2, s=4, y=20)
    // treated:  (id3, s=1.5, y=30) -> prev d=0.5 beats next d=2.5 -> y=10
    //           (id4, s=8, y=40)   -> only prev, d=4 <= 5          -> y=20
    val units = Seq(("s", 1L, false, 1.0, 10), ("s", 2L, false, 4.0, 20),
      ("s", 3L, true, 1.5, 30), ("s", 4L, true, 8.0, 40))
      .toDF("st", "id", "t", "score", "y")
    val r = Experiment.matchedOutcomes(units, Seq("st"), "id", "t", "score", "y",
      caliper = 5.0).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 20.0) // ((30-10) + (40-20)) / 2
    // tighter caliper drops id4's d=4 match
    val r2 = Experiment.matchedOutcomes(units, Seq("st"), "id", "t", "score", "y",
      caliper = 3.0).collect().head
    assert(r2.getLong(2) == 1L && r2.getDouble(3) == 20.0)
  }

  test("matchedOutcomes: equal-score control matches at distance 0; distance ties prefer preceding") {
    // control id5 shares the treated score -> distance 0 wins
    val eq = Seq(("s", 1L, false, 1.0, 10), ("s", 5L, false, 1.5, 50),
      ("s", 3L, true, 1.5, 30)).toDF("st", "id", "t", "score", "y")
    val re = Experiment.matchedOutcomes(eq, Seq("st"), "id", "t", "score", "y", 5.0)
      .collect().head
    assert(re.getDouble(3) == -20.0) // 30 - 50
    // equidistant controls (1 and 3 around treated 2) -> preceding wins
    val tie = Seq(("s", 1L, false, 1.0, 10), ("s", 2L, false, 3.0, 20),
      ("s", 3L, true, 2.0, 30)).toDF("st", "id", "t", "score", "y")
    val rt = Experiment.matchedOutcomes(tie, Seq("st"), "id", "t", "score", "y", 5.0)
      .collect().head
    assert(rt.getDouble(3) == 20.0) // 30 - 10
  }

  test("permutationTestByGroup: a single group reproduces permutationTest exactly") {
    val users = (1L to 200L).map(i =>
      ("only", i, if (i % 2 == 0) "a" else "b", (i % 7).toInt))
      .toDF("g", "uid", "arm", "v")
    val grouped = Experiment.permutationTestByGroup(users, Seq("g"), "uid", "arm",
      "v", reps = 50, salt = "s1").collect().head
    val single = Experiment.permutationTest(users, "uid", "arm", "v",
      reps = 50, salt = "s1").collect().head
    // (n_a, n_b, diff_obs, reps, p) must agree column-for-column
    assert(grouped.getLong(1) == single.getLong(0))
    assert(grouped.getLong(2) == single.getLong(1))
    assert(grouped.getDouble(3) == single.getDouble(4))
    assert(grouped.getLong(4) == single.getLong(5))
    assert(grouped.getDouble(5) == single.getDouble(6))
  }

  test("permutationTestByGroup: the coin is per-(unit, rep) — a cloned group gets identical p") {
    val g1 = (1L to 100L).map(i => ("g1", i, if (i % 2 == 0) "a" else "b", (i % 5).toInt))
    val g2 = g1.map { case (_, i, a, v) => ("g2", i, a, v) } // same units, same values
    val users = (g1 ++ g2).toDF("g", "uid", "arm", "v")
    val got = Experiment.permutationTestByGroup(users, Seq("g"), "uid", "arm", "v",
      reps = 40, salt = "s2")
      .select("g", "p_value").as[(String, Double)].collect().toMap
    assert(got("g1") == got("g2"))
    // a group with one arm only yields null p, zero usable reps
    val oneArm = Seq(("g3", 1L, "a", 1), ("g3", 2L, "a", 2)).toDF("g", "uid", "arm", "v")
    val r = Experiment.permutationTestByGroup(oneArm, Seq("g"), "uid", "arm", "v",
      reps = 40, salt = "s2").collect().head
    assert(r.getLong(4) == 0L && r.isNullAt(5))
  }

  test("powerAnalysis: textbook two-proportion n, unmeasurable MDE nulls, monotone in MDE") {
    // 1000 users at exactly 10% conversion -> base_rate 0.1 on the grid;
    // p1=0.10, p2=0.12 is the classic table entry: n per arm ~ 3840.8
    val users = (1L to 1000L).map(i => (i, i % 10 == 0)).toDF("uid", "conv")
      .withColumn("g", lit("all"))
    val rows = Experiment.powerAnalysis(users, Seq("g"), "uid", "conv",
      mdes = Seq(0.02, 0.05, 0.9, 0.95))
      .orderBy(col("mde")).collect()
    assert(rows.forall(_.getDouble(1) == 0.1))
    val n002 = rows(0).getDouble(3)
    assert(math.abs(n002 - 3840.8) < 1.0, s"expected ~3840.8 per arm, got $n002")
    // bigger effect, smaller test
    assert(rows(1).getDouble(3) < n002)
    // p2 = 0.1 + 0.9 = 1.0 and beyond: unmeasurable from this base rate
    assert(rows(2).isNullAt(3) && rows(3).isNullAt(3))
    intercept[IllegalArgumentException](
      Experiment.powerAnalysis(users, Seq("g"), "uid", "conv", mdes = Seq(0.0)))
  }

  test("msprtReadout: p is monotone nonincreasing, detects a persistent effect, passes degenerate cuts through") {
    // growing cuts with a persistent 10% vs 40% effect — the mixture LR
    // must eventually reject; a degenerate all-convert cut mid-sequence
    // must carry null log Λ and leave the running p untouched
    val cuts = Seq(
      (1L, 100L, 100L, 10L, 40L),
      (2L, 1000L, 1000L, 100L, 400L),
      (3L, 1000L, 1000L, 1000L, 1000L), // pooled = 1 -> se2 = 0: degenerate
      (4L, 10000L, 10000L, 1000L, 4000L))
      .toDF("cut", "n_a", "n_b", "conv_a", "conv_b")
    val rows = Experiment.msprtReadout(cuts, "cut", tau2 = 1e-4)
      .orderBy(col("cut")).collect()
    val ps = rows.map(_.getDouble(5))
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a }, s"p must never rise: ${ps.toSeq}")
    assert(rows(2).isNullAt(4), "degenerate cut must carry null log_lambda")
    assert(ps(2) == ps(1), "degenerate cut must not move the running p")
    assert(ps(3) < 0.05, s"persistent large effect at n=10k must reject, got ${ps(3)}")
    // a null-effect sequence stays near 1
    val nullCuts = Seq((1L, 500L, 500L, 100L, 100L), (2L, 5000L, 5000L, 1000L, 1010L))
      .toDF("cut", "n_a", "n_b", "conv_a", "conv_b")
    val pNull = Experiment.msprtReadout(nullCuts, "cut", tau2 = 1e-4)
      .orderBy(col("cut")).collect().last.getDouble(5)
    assert(pNull > 0.5, s"null effect must not reject, got $pNull")
    intercept[IllegalArgumentException](
      Experiment.msprtReadout(nullCuts, "cut", tau2 = 0.0))
  }

  test("msprtMeanReadout: detects a mean shift, passes degenerate cuts through, null effect stays high") {
    // moments for arm a ~ N-ish around 10 and arm b around 13 built from
    // integral samples: a = {8,10,12,...}, b = {11,13,15,...} — exact
    // (n, Σx, Σx²) cumulative cuts
    def moments(xs: Seq[Long]) = (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
    val a1 = Seq(8L, 10L, 12L); val b1 = Seq(11L, 13L, 15L)
    val aBig = (1 to 400).map(i => 8L + (i % 5)); val bBig = (1 to 400).map(i => 11L + (i % 5))
    val (na1, sa1, qa1) = moments(a1); val (nb1, sb1, qb1) = moments(b1)
    val (na2, sa2, qa2) = moments(a1 ++ aBig); val (nb2, sb2, qb2) = moments(b1 ++ bBig)
    val cuts = Seq(
      (1L, na1, sa1, qa1, nb1, sb1, qb1),
      (2L, 2L, 20L, 200L, 2L, 26L, 338L), // both arms constant -> s2 = 0: degenerate
      (3L, na2, sa2, qa2, nb2, sb2, qb2))
      .toDF("cut", "n_a", "sum_a", "sumsq_a", "n_b", "sum_b", "sumsq_b")
    val rows = Experiment.msprtMeanReadout(cuts, "cut", tau2 = 1.0)
      .orderBy(col("cut")).collect()
    val ps = rows.map(_.getDouble(5))
    assert(ps.zip(ps.tail).forall { case (x, y) => y <= x }, s"p must never rise: ${ps.toSeq}")
    assert(rows(1).isNullAt(4), "zero-variance cut must carry null log_lambda")
    assert(ps(1) == ps(0), "degenerate cut must not move the running p")
    assert(ps(2) < 0.05, s"persistent 3-unit shift at n=400 must reject, got ${ps(2)}")
    // equal-mean arms: p stays near 1
    val (nn, sn, qn) = moments(aBig)
    val nullCuts = Seq((1L, nn, sn, qn, nn, sn, qn))
      .toDF("cut", "n_a", "sum_a", "sumsq_a", "n_b", "sum_b", "sumsq_b")
    val pNull = Experiment.msprtMeanReadout(nullCuts, "cut", tau2 = 1.0)
      .collect().head.getDouble(5)
    assert(pNull > 0.5, s"null effect must not reject, got $pNull")
    intercept[IllegalArgumentException](
      Experiment.msprtMeanReadout(nullCuts, "cut", tau2 = 0.0))
  }

  test("powerAnalysisMean: textbook normal-mean n, monotone in MDE, n<2 nulls, integral gate") {
    // variance exactly 1 (alternating ±1 around mean 10: values 9,11):
    // n = 2·1·(1.959964+0.841621)²/δ²; δ=0.5 -> ~62.79 per arm
    val obs = (1 to 100).map(i => (if (i % 2 == 0) 9L else 11L, "g1")).toDF("v", "g")
    val rows = Experiment.powerAnalysisMean(obs, Seq("g"), "v", mdes = Seq(0.5, 1.0))
      .orderBy(col("mde")).collect()
    val varQ = rows.head.getDouble(1)
    // sample variance of 50×9 + 50×11 around 10: 100/99 ≈ 1.010101
    assert(math.abs(varQ - 1.010101) < 1e-6, s"variance grid point: $varQ")
    val z = 1.959964 + 0.841621
    val expect05 = 2.0 * z * z * varQ / 0.25
    assert(math.abs(rows(0).getDouble(3) - expect05) < 1e-3)
    assert(rows(1).getDouble(3) < rows(0).getDouble(3), "bigger effect, smaller test")
    // a 1-observation group cannot estimate variance
    val tiny = Seq((5L, "g1")).toDF("v", "g")
    val t = Experiment.powerAnalysisMean(tiny, Seq("g"), "v", mdes = Seq(1.0)).collect().head
    assert(t.isNullAt(1) && t.isNullAt(3))
    intercept[IllegalArgumentException](
      Experiment.powerAnalysisMean(obs, Seq("g"), "v", mdes = Seq(-1.0)))
    intercept[IllegalArgumentException](
      Experiment.powerAnalysisMean(
        Seq((1.5, "g")).toDF("v", "g"), Seq("g"), "v", mdes = Seq(1.0)))
  }

  test("bradleyTerry: transitive dominance orders strengths; symmetric duels tie; zero-win floor") {
    // A beats B 9:1, B beats C 9:1, A beats C 9:1 — strict dominance
    def rep(w: String, l: String, n: Int) = Seq.fill(n)((w, l))
    val duels = (rep("A", "B", 9) ++ rep("B", "A", 1) ++
      rep("B", "C", 9) ++ rep("C", "B", 1) ++
      rep("A", "C", 9) ++ rep("C", "A", 1)).toDF("w", "l")
    val out = Experiment.bradleyTerry(duels, "w", "l")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("A")._1 > out("B")._1 && out("B")._1 > out("C")._1,
      s"dominance must order strengths: $out")
    assert(out("A")._2 == 18L && out("C")._2 == 2L)
    assert(out.values.forall(_._3 == 20L), "each item fought 20 duels")
    // symmetric record -> equal strengths (normalized to 1.0 each)
    val even = (rep("X", "Y", 5) ++ rep("Y", "X", 5)).toDF("w", "l")
    val evenOut = Experiment.bradleyTerry(even, "w", "l")
      .collect().map(_.getDouble(1)).toSeq
    assert(evenOut == Seq(1.0, 1.0), s"symmetric duels must tie at 1.0: $evenOut")
    // an item that never wins floors at the nano-grid, never NaN/negative
    val shutout = rep("P", "Q", 4).toDF("w", "l")
    val so = Experiment.bradleyTerry(shutout, "w", "l")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(so("Q") >= 0.0 && so("Q") < so("P"), s"shutout must floor, not die: $so")
    // determinism: identical input, identical bits
    val a = Experiment.bradleyTerry(duels, "w", "l").orderBy(col("item")).collect().toSeq
    val b = Experiment.bradleyTerry(duels, "w", "l").orderBy(col("item")).collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException](
      Experiment.bradleyTerry(duels, "w", "l", iterations = 0))
  }

  test("positionBias: exact binomial z off integer counts; empty input nulls") {
    // 75 first-position wins in 100 duels: rate 0.75, z = (150-100)/10 = 5.0
    val duels = ((1 to 75).map(_ => ("x", "x")) ++ (1 to 25).map(_ => ("y", "x")))
      .toDF("winner", "first")
    val r = Experiment.positionBias(duels, "winner", "first").collect().head
    assert(r.getLong(0) == 100L && r.getLong(1) == 75L)
    assert(r.getDouble(2) == 0.75 && r.getDouble(3) == 5.0)
    val empty = Seq.empty[(String, String)].toDF("winner", "first")
    val e = Experiment.positionBias(empty, "winner", "first").collect().head
    assert(e.getLong(0) == 0L && e.isNullAt(2) && e.isNullAt(3))
  }

  test("transitivityAudit: consistent triad clean, planted cycle counted once, ties undecided") {
    def rep(w: String, l: String, n: Int) = Seq.fill(n)((w, l))
    // consistent: A>B>C with A>C; cyclic: D>E>F>D; tie pair: G~H (2:2)
    val duels = (rep("A", "B", 3) ++ rep("B", "C", 3) ++ rep("A", "C", 3) ++
      rep("D", "E", 3) ++ rep("E", "F", 3) ++ rep("F", "D", 3) ++
      rep("G", "H", 2) ++ rep("H", "G", 2)).toDF("w", "l")
    val r = Experiment.transitivityAudit(duels, "w", "l").collect().head
    assert(r.getLong(0) == 8L, s"items: $r")
    assert(r.getLong(1) == 6L, s"decided pairs (tie excluded): $r")
    assert(r.getLong(2) == 2L, s"decided triads: $r")
    assert(r.getLong(3) == 1L, s"the D-E-F cycle counted exactly once: $r")
    assert(r.getDouble(4) == 0.5)
  }

  test("matchedOutcomes: control-free stratum emits zero matches and null ATT") {
    val units = Seq(("s", 1L, true, 1.0, 10), ("s", 2L, true, 2.0, 20))
      .toDF("st", "id", "t", "score", "y")
    val r = Experiment.matchedOutcomes(units, Seq("st"), "id", "t", "score", "y", 5.0)
      .collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 0L && r.isNullAt(3))
    intercept[IllegalArgumentException](
      Experiment.matchedOutcomes(units, Seq.empty, "id", "t", "score", "y", 5.0))
    intercept[IllegalArgumentException](
      Experiment.matchedOutcomes(units, Seq("st"), "id", "t", "score", "y", 0.0))
  }
}
