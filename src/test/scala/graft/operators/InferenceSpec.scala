package graft.operators

import graft.TestSpark
import graft.functions.Quantize.scaledFloorDouble
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class InferenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- spearmanByGroup -----------------------------------------------

  test("spearman: perfect monotone association is ±1 regardless of magnitudes") {
    val df = Seq(("g", 1.0, 10.0), ("g", 2.0, 1000.0), ("g", 3.0, 1e6),
      ("h", 1.0, 5.0), ("h", 2.0, 4.0), ("h", 3.0, 3.0)).toDF("g", "x", "y")
    val r = Inference.spearmanByGroup(df, Seq("g"), "x", "y")
      .as[(String, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r("g") == ((3L, Some(1.0))) && r("h") == ((3L, Some(-1.0))))
  }

  test("spearman: average ranks on ties (hand-computed 3-point case)") {
    // x = [1,1,2] -> avg ranks [1.5,1.5,3]; y = [1,2,3] -> [1,2,3]
    // rho = 6/sqrt(6*8) = 0.866025403...
    val df = Seq(("g", 1.0, 1.0), ("g", 1.0, 2.0), ("g", 2.0, 3.0)).toDF("g", "x", "y")
    val Some(rho) = Inference.spearmanByGroup(df, Seq("g"), "x", "y")
      .as[(String, Long, Option[Double])].collect().head._3
    assert(rho == scaledFloorDouble(6.0 / math.sqrt(48.0), 6))
  }

  test("spearman: a constant side yields null (no variance in ranks)") {
    val df = Seq(("g", 1.0, 1.0), ("g", 1.0, 2.0), ("g", 1.0, 3.0)).toDF("g", "x", "y")
    assert(Inference.spearmanByGroup(df, Seq("g"), "x", "y")
      .as[(String, Long, Option[Double])].collect().head._3.isEmpty)
  }

  // ---- welchTTest ----------------------------------------------------

  test("welch t: hand-computed unequal-variance two-sample case") {
    // a = [1,2,3]: mean 2, var 1; b = [2,4,6,8]: mean 5, var 20/3
    // se2 = 1/3 + 5/3 = 2; t = (5-2)/sqrt(2); df Welch-Satterthwaite
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(2, 4, 6, 8).map(("b", _)))
      .toDF("arm", "v")
    val row = Inference.welchTTest(df, "arm", "v", "a", "b").collect().head
    assert(row.getLong(0) == 3L && row.getLong(1) == 4L)
    assert(row.getDouble(2) == 2.0 && row.getDouble(3) == 5.0)
    val sea = 1.0 / 3.0; val seb = (20.0 / 3.0) / 4.0
    // t is b-minus-a (the scorecard sign convention)
    assert(row.getDouble(4) == scaledFloorDouble((5.0 - 2.0) / math.sqrt(sea + seb), 6))
    assert(row.getDouble(5) == scaledFloorDouble(
      (sea + seb) * (sea + seb) / (sea * sea / 2.0 + seb * seb / 3.0), 6))
  }

  test("welch t: n < 2 in an arm yields null statistics, means still emitted") {
    val df = Seq(("a", 1), ("b", 2), ("b", 4)).toDF("arm", "v")
    val row = Inference.welchTTest(df, "arm", "v", "a", "b").collect().head
    assert(row.isNullAt(4) && row.isNullAt(5) && row.getDouble(2) == 1.0)
  }

  // ---- anovaOneWay ---------------------------------------------------

  test("anova: hand-computed two-group case (SSB 13.5, SSW 4, F 13.5)") {
    val df = (Seq(1, 2, 3).map(("g1", _)) ++ Seq(4, 5, 6).map(("g2", _)))
      .toDF("g", "v")
    val row = Inference.anovaOneWay(df, "g", "v").collect().head
    assert(row.getLong(0) == 2L && row.getLong(1) == 6L)
    assert(row.getDouble(2) == 13.5 && row.getDouble(3) == 4.0)
    assert(row.getDouble(4) == 13.5)
  }

  test("anova: zero within-group variance yields null F") {
    val df = Seq(("g1", 1), ("g1", 1), ("g2", 2), ("g2", 2)).toDF("g", "v")
    assert(Inference.anovaOneWay(df, "g", "v").collect().head.isNullAt(4))
  }

  test("anova: identical group means clamp SSB at 0 instead of going negative") {
    // each group's S^2/n = 4/3 rounds DOWN at the 1e-6 grid while the
    // grand term 16/6 rounds exactly — the raw difference is ~-7e-7
    val df = (Seq(1, 1, 0).map(("g1", _)) ++ Seq(1, 1, 0).map(("g2", _)))
      .toDF("g", "v")
    val row = Inference.anovaOneWay(df, "g", "v").collect().head
    assert(row.getDouble(2) == 0.0 && row.getDouble(4) == 0.0)
  }

  // ---- mergeable moment partials (round 12) ---------------------------

  test("momentPartial/momentMerge: merged shards equal the from-scratch partial bit-exactly") {
    // fractional values at decimalScale=2 — exactly where a FLOAT partial
    // would drift with shard boundaries; decimals must not
    val rows = Seq(("a", 1.25), ("a", 2.17), ("a", 3.33), ("b", 2.01),
      ("b", 4.44), ("b", 6.06), ("b", 8.88), ("a", 0.07))
    val df = rows.toDF("arm", "v")
    val whole = Inference.momentPartial(df, Seq("arm"), "v")
      .orderBy("arm").collect().toSeq
    // three arbitrary shards, unequal sizes, arms split across shards
    val shards = Seq(rows.take(2), rows.slice(2, 3), rows.drop(3))
      .map(_.toDF("arm", "v"))
    val parts = shards.map(Inference.momentPartial(_, Seq("arm"), "v"))
    val merged = Inference.momentMerge(parts, Seq("arm"))
      .orderBy("arm").collect().toSeq
    assert(merged == whole)
    // associativity: merge(merge(a, b), c) == merge(a, b, c)
    val nested = Inference.momentMerge(
      Seq(Inference.momentMerge(parts.take(2), Seq("arm")), parts(2)), Seq("arm"))
      .orderBy("arm").collect().toSeq
    assert(nested == whole)
    // the readouts off merged partials are bit-identical to from-scratch
    val welchScratch = Inference.welchTTest(df, "arm", "v", "a", "b").collect().toSeq
    val welchMerged = Inference.welchFromMoments(
      Inference.momentMerge(parts, Seq("arm")), "arm", "a", "b").collect().toSeq
    assert(welchMerged == welchScratch)
    val anovaScratch = Inference.anovaOneWay(df, "arm", "v").collect().toSeq
    val anovaMerged = Inference.anovaFromMoments(
      Inference.momentMerge(parts, Seq("arm"))).collect().toSeq
    assert(anovaMerged == anovaScratch)
    intercept[IllegalArgumentException](Inference.momentMerge(Nil, Seq("arm")))
    intercept[IllegalArgumentException](
      Inference.momentMerge(Seq(df), Seq("arm"))) // not a partial schema
  }

  // ---- kendallTauB ---------------------------------------------------

  test("kendall tau-b: perfect concordance is 1; tie-corrected case matches hand count") {
    val perfect = Seq(("g", 1L, 1.0, 1.0), ("g", 2L, 2.0, 2.0), ("g", 3L, 3.0, 3.0))
      .toDF("g", "id", "x", "y")
    val p = Inference.kendallTauB(perfect, Seq("g"), "id", "x", "y").collect().head
    assert(p.getLong(2) == 3L && p.getLong(3) == 3L && p.getLong(4) == 0L)
    assert(p.getDouble(5) == 1.0)
    // (1,1),(1,2),(2,3): C=2, D=0, tied-x-only=1, tied-y-only=0
    // tau = 2/sqrt((2+0)*(2+1)) = 2/sqrt(6)
    val tied = Seq(("g", 1L, 1.0, 1.0), ("g", 2L, 1.0, 2.0), ("g", 3L, 2.0, 3.0))
      .toDF("g", "id", "x", "y")
    val t = Inference.kendallTauB(tied, Seq("g"), "id", "x", "y").collect().head
    assert(t.getLong(3) == 2L && t.getLong(4) == 0L)
    assert(t.getDouble(5) == scaledFloorDouble(2.0 / math.sqrt(6.0), 6))
  }

  test("kendall tau-b: single-row group emits zero pairs and null tau") {
    val df = Seq(("g", 1L, 1.0, 1.0)).toDF("g", "id", "x", "y")
    val r = Inference.kendallTauB(df, Seq("g"), "id", "x", "y").collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) == 0L && r.isNullAt(5))
  }

  // ---- ratioJackknife ------------------------------------------------

  test("ratio jackknife: proportional units have zero SE; hand-computed spread case") {
    val prop = Seq(("g", 2, 1), ("g", 4, 2), ("g", 6, 3)).toDF("g", "y", "x")
    val p = Inference.ratioJackknife(prop, Seq("g"), "y", "x").collect().head
    assert(p.getDouble(2) == 2.0 && p.getDouble(3) == 0.0)
    // units (1,1),(3,1): theta = 2, pseudo-values 3 and 1 ->
    // SE^2 = (n-1)/n * sum(dev^2) = 0.5 * 2 = 1
    val spread = Seq(("g", 1, 1), ("g", 3, 1)).toDF("g", "y", "x")
    val s = Inference.ratioJackknife(spread, Seq("g"), "y", "x").collect().head
    assert(s.getDouble(2) == 2.0 && s.getDouble(3) == 1.0)
  }

  test("ratio jackknife: a zero leave-one-out denominator nulls the SE, not theta") {
    val df = Seq(("g", 1, 0), ("g", 1, 1)).toDF("g", "y", "x")
    val r = Inference.ratioJackknife(df, Seq("g"), "y", "x").collect().head
    assert(r.getDouble(2) == 2.0 && r.isNullAt(3))
  }

  test("parameter guards fail loudly") {
    val df = Seq(("g", 1.0, 1.0)).toDF("g", "x", "y")
    intercept[IllegalArgumentException](
      Inference.spearmanByGroup(df, Seq.empty, "x", "y"))
    intercept[IllegalArgumentException](
      Inference.kendallTauB(df, Seq.empty, "g", "x", "y"))
    intercept[IllegalArgumentException](
      Inference.ratioJackknife(df, Seq.empty, "x", "y"))
  }

  // ---- mannKendall ---------------------------------------------------

  test("mann-kendall: strictly monotone series, hand-computed S/Var/z") {
    // [1,2,3,4]: S = 6, no ties -> Var = 4*3*13/18, z = (S-1)/sqrt(Var)
    val up = Seq(("g", 0L, 1), ("g", 1L, 2), ("g", 2L, 3), ("g", 3L, 4))
      .toDF("g", "t", "v")
    val r = Inference.mannKendall(up, Seq("g"), "t", "v").collect().head
    val varS = 4.0 * 3.0 * 13.0 / 18.0
    assert(r.getLong(1) == 4L && r.getLong(2) == 6L)
    assert(r.getDouble(3) == scaledFloorDouble(varS, 6))
    assert(r.getDouble(4) == scaledFloorDouble(5.0 / math.sqrt(varS), 6))
    // decreasing mirrors with the +1 continuity correction
    val down = Seq(("g", 0L, 4), ("g", 1L, 3), ("g", 2L, 2), ("g", 3L, 1))
      .toDF("g", "t", "v")
    val rd = Inference.mannKendall(down, Seq("g"), "t", "v").collect().head
    assert(rd.getLong(2) == -6L)
    assert(rd.getDouble(4) == scaledFloorDouble(-5.0 / math.sqrt(varS), 6))
  }

  test("mann-kendall: a fully-tied series has zero variance and null z") {
    val flat = Seq(("g", 0L, 5), ("g", 1L, 5), ("g", 2L, 5)).toDF("g", "t", "v")
    val r = Inference.mannKendall(flat, Seq("g"), "t", "v").collect().head
    assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0 && r.isNullAt(4))
  }

  // ---- bhAdjust ------------------------------------------------------

  test("bh: hand-computed step-up adjusted p-values and rejections") {
    // p = [.01,.02,.04,.05], m = 4: raw p*m/rank = [.04,.04,.053..,.05]
    // suffix-min -> adj = [.04,.04,.05,.05]
    val df = Seq(("t1", 0.01), ("t2", 0.02), ("t3", 0.04), ("t4", 0.05))
      .toDF("test", "p")
    val got = Inference.bhAdjust(df, "p", Seq("test"), alpha = 0.045)
      .select("test", "rank", "p_adj", "reject")
      .as[(String, Long, Double, Boolean)].collect().sortBy(_._2)
    assert(got.map(_._3).toSeq == Seq(0.04, 0.04, 0.05, 0.05))
    assert(got.map(_._4).toSeq == Seq(true, true, false, false))
    // the cap: a p near 1 never adjusts above 1
    val one = Seq(("t1", 0.9999)).toDF("test", "p")
    assert(Inference.bhAdjust(one, "p", Seq("test"), 0.05)
      .select("p_adj").as[Double].collect().head == 0.9999)
    intercept[IllegalArgumentException](Inference.bhAdjust(df, "p", Seq("test"), 1.5))
    intercept[IllegalArgumentException](Inference.bhAdjust(df, "p", Seq.empty, 0.05))
  }
}
