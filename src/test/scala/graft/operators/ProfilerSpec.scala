package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profileColumns: exact null/min/max accounting, sketch estimate in band, string ordering documented") {
    val df = (1 to 100).map { i =>
      (i.toLong, if (i % 4 == 0) null else s"cat${i % 3}")
    }.toDF("id", "cat")
    val prof = Profiler.profileColumns(df, Seq("id", "cat"), p = 6, salt = "ps")
      .orderBy("column").collect()
    assert(prof.length == 2)
    val catRow = prof(0); val idRow = prof(1)

    assert(catRow.getString(0) == "cat")
    assert(catRow.getLong(1) == 100 && catRow.getLong(2) == 25) // every 4th null
    assert(catRow.getString(3) == "cat0" && catRow.getString(4) == "cat2")
    // 3 distinct values, tiny vs m=64 -> linear counting lands near-exact
    assert(math.abs(catRow.getAs[Double]("distinct_est") - 3.0) < 1.0)

    assert(idRow.getString(0) == "id")
    assert(idRow.getLong(1) == 100 && idRow.getLong(2) == 0)
    // min/max are STRING-ordered by contract: "1" < "100" < "99"
    assert(idRow.getString(3) == "1" && idRow.getString(4) == "99")
    // 100 distinct, HLL at m=64: standard error ~13%, assert a loose band
    val est = idRow.getAs[Double]("distinct_est")
    assert(est > 60 && est < 160, s"distinct_est $est out of band for 100")
  }

  test("histogram: uniform domain fills equal bins; out-of-domain values clamp to edges") {
    val df = (0L until 4096L).toDF("v").withColumn("g", lit("a"))
    val got = Profiler.histogram(df, "v", Seq("g"), minV = 0L, maxV = 4095L, bins = 16)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got.keySet == (0L until 16L).toSet && got.values.forall(_ == 256L))
    val outliers = Seq(-100L, -1L, 5000L, 999999L).toDF("v").withColumn("g", lit("a"))
    val clamped = Profiler.histogram(outliers, "v", Seq("g"), 0L, 4095L, 16)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(clamped == Map(0L -> 2L, 15L -> 2L), s"clamping broken: $clamped")
    intercept[IllegalArgumentException](Profiler.histogram(df, "v", Seq("g"), 0L, 10L, 12))
  }

  test("expect: passing and failing checks report by name; null aggregates coalesce to false") {
    val df = (1L to 50L).toDF("v")
    val got = Profiler.expect(df, Seq(
      "count_ok" -> (count(lit(1)) === 50),
      "max_bound" -> (max(col("v")) <= 10),
      "null_agg" -> (min(when(lit(false), col("v"))) > 0)))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got == Map("count_ok" -> true, "max_bound" -> false, "null_agg" -> false))
    intercept[IllegalArgumentException](Profiler.expect(df, Seq.empty))
    intercept[IllegalArgumentException](
      Profiler.expect(df, Seq("a" -> lit(true), "a" -> lit(false))))
  }

  test("histogramDrift: identical corpora -> 0; disjoint -> 1; order symmetric") {
    val a = (0L until 1000L).toDF("v")
    val b = (3000L until 4000L).toDF("v")
    def tv(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      Profiler.histogramDrift(x, y, "v", 0L, 4095L, 16).head().getDouble(0)
    assert(tv(a, a) == 0.0)
    assert(tv(a, b) == 1.0)
    assert(tv(a, b) == tv(b, a))
  }

  test("fdViolations: holding dependency empty, broken one reports the violating X with counts") {
    val df = Seq((1L, "a", "x"), (2L, "a", "x"), (3L, "b", "y"), (4L, "b", "z"))
      .toDF("id", "x", "y")
    assert(Profiler.fdViolations(df, Seq("id"), Seq("x")).isEmpty, "key -> anything must hold")
    val got = Profiler.fdViolations(df, Seq("x"), Seq("y"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("b" -> 2L))
  }

  test("entropyCard: constant column 0, uniform column ln(k); nulls count as a value") {
    val df = (1L to 100L).map(i => ("const", s"u${i % 4}", if (i <= 50) Some("a") else None))
      .toDF("c1", "c2", "c3")
    val got = Profiler.entropyCard(df, Seq("c1", "c2", "c3"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("c1") == ((1L, 0.0)))
    assert(got("c2")._1 == 4L && math.abs(got("c2")._2 - math.log(4.0)) < 1e-6)
    assert(got("c3")._1 == 2L && math.abs(got("c3")._2 - math.log(2.0)) < 1e-6)
  }

  test("riOrphans: clean FK empty; planted orphans surface with row counts") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val fact = Seq(1L, 1L, 2L, 9L, 9L, 9L).toDF("fk")
    assert(Profiler.riOrphans(fact.filter(col("fk") < 3), "fk", dim, "k").isEmpty)
    val got = Profiler.riOrphans(fact, "fk", dim, "k").as[(Long, Long)].collect().toMap
    assert(got == Map(9L -> 3L))
  }

  test("profileColumns rejects an empty column list") {
    intercept[IllegalArgumentException](
      Profiler.profileColumns(Seq((1, "a")).toDF("a", "b"), Seq.empty))
  }

  test("reliabilityCard: hand-computed bins, integer-grid means, gaps; edge scores clamp") {
    // bin width 0.25: scores planted per bucket with known positive rates
    val rows = Seq(
      (0.10, false), (0.20, false),           // bin 0: mean .15, pos 0/2
      (0.30, true), (0.40, false),            // bin 1: mean .35, pos 1/2
      (0.60, true), (0.70, true),             // bin 2: mean .65, pos 2/2
      (0.90, true), (1.00, false), (1.20, true)) // bin 3 (1.0 and 1.2 clamp in)
      .toDF("score", "label")
    val got = Profiler.reliabilityCard(rows, "score", "label", bins = 4)
      .orderBy("bin")
      .as[(Long, Long, Double, Double, Double)].collect()
    def fl6(x: Double) = graft.functions.Quantize.scaledFloorDouble(x, 6)
    assert(got.map(r => (r._1, r._2)).toSeq == Seq((0L, 2L), (1L, 2L), (2L, 2L), (3L, 3L)))
    val b0 = got(0); val b2 = got(2); val b3 = got(3)
    assert(b0._3 == fl6(0.15) && b0._4 == 0.0 && b0._5 == fl6(math.abs(b0._3 - 0.0)))
    assert(b2._4 == 1.0 && b2._5 == fl6(math.abs(b2._3 - 1.0)))
    // the clamped 1.2 participates in bin 3's mean via the 1e-7 grid
    val s7 = math.floor(0.9 * 1e7 + 0.5) + math.floor(1.0 * 1e7 + 0.5) +
      math.floor(1.2 * 1e7 + 0.5)
    assert(b3._3 == fl6(s7 / 1e7 / 3.0))
  }

  test("psi: identical vintages score ~0; a gross shift scores major; hand-checked two-bin case") {
    import spark.implicits._
    val a = (1 to 512).map(i => i.toLong % 64L).toDF("v")
    // identical distributions: every (pa - pb) is 0 -> psi exactly 0
    assert(Profiler.psi(a, a, "v", 0L, 63L, 8).as[Double].head() == 0.0)
    // all mass moves from bin 0 to bin 1: hand-computable with smoothing
    val lo = Seq.fill(100)(0L).toDF("v")
    val hi = Seq.fill(100)(1L).toDF("v")
    val got = Profiler.psi(lo, hi, "v", 0L, 1L, 2)
      .as[Double].head()
    // symmetric construction: both bins contribute (100/102)·ln(101)
    val pa0 = 101.0 / 102.0; val pb0 = 1.0 / 102.0
    val c7a = math.floor((pa0 - pb0) * math.log(pa0 / pb0) * 1.0e7 + 0.5)
    val c7b = math.floor((pb0 - pa0) * math.log(pb0 / pa0) * 1.0e7 + 0.5)
    assert(got == graft.functions.Quantize.scaledFloorDouble((c7a + c7b) / 1.0e7, 6))
    assert(got > 0.25) // the "major shift" band
  }

  test("mannWhitney: hand-computed U with ties; identical samples center; degenerate sigma nulls z") {
    import spark.implicits._
    // A = {1, 2, 4}, B = {2, 3}: combined ranks 1:(1), 2:(2.5, 2.5), 3:(4), 4:(5)
    // R_A = 1 + 2.5 + 5 = 8.5; U_A = 8.5 - 3*4/2 = 2.5
    val a = Seq(1L, 2L, 4L).toDF("v")
    val b = Seq(2L, 3L).toDF("v")
    val got = Profiler.mannWhitney(a, b, "v")
      .as[(Long, Long, Double, Option[Double])].head()
    assert(got._1 == 3L && got._2 == 2L && got._3 == 2.5)
    // z formula with one tie group of size 2: ties term = 2^3 - 2 = 6
    val (na, nb) = (3.0, 2.0); val n = na + nb
    val mu = na * nb / 2.0
    val sigma2 = na * nb / 12.0 * ((n + 1.0) - 6.0 / (n * (n - 1.0)))
    assert(got._4.contains(
      graft.functions.Quantize.scaledFloorDouble((2.5 - mu) / math.sqrt(sigma2), 6)))
    // identical samples: U_A = n^2/2, z = 0
    val same = Seq(1L, 2L, 3L).toDF("v")
    val eq = Profiler.mannWhitney(same, same, "v")
      .as[(Long, Long, Double, Option[Double])].head()
    assert(eq._3 == 4.5 && eq._4.contains(0.0))
    // every value equal: sigma = 0 -> z null
    val const = Seq(7L, 7L).toDF("v")
    assert(Profiler.mannWhitney(const, const, "v")
      .as[(Long, Long, Double, Option[Double])].head()._4.isEmpty)
  }

  test("giniConcentration: uniform groups score exactly 0; total concentration approaches (n-1)/n") {
    import spark.implicits._
    val uniform = (1 to 100).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "g")
    val u = Profiler.giniConcentration(uniform, "g")
      .as[(Long, Long, Double)].head()
    assert(u == ((4L, 100L, 0.0)))
    // 97 of 100 rows in one group of four
    val skewed = (1 to 100).map(i =>
      (i.toLong, if (i <= 97) "big" else s"s$i")).toDF("id", "g")
    val s = Profiler.giniConcentration(skewed, "g")
      .as[(Long, Long, Double)].head()
    // x sorted asc = (1, 1, 1, 97), ranks 1..4: G = 2*(1+2+3+4*97)/(4*100) - 5/4
    val want = graft.functions.Quantize.scaledFloorDouble(
      2.0 * (1 + 2 + 3 + 4 * 97).toDouble / (4.0 * 100.0) - 5.0 / 4.0, 6)
    assert(s == ((4L, 100L, want)) && s._3 > 0.7)
  }

  test("cohenKappa: hand-computed 2x2 case, chance-only raters, constant raters, null exclusion") {
    import spark.implicits._
    // 10 items: raters agree on 8 (6 yes, 2 no), disagree on 2
    val rows = Seq.fill(6)(("y", "y")) ++ Seq.fill(2)(("n", "n")) ++
      Seq(("y", "n"), ("n", "y"))
    val got = Profiler.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Double, Double, Option[Double])].head()
    // po = 0.8; marginals A: y7 n3, B: y7 n3 -> pe = (49+9)/100 = 0.58
    def fl6(x: Double) = graft.functions.Quantize.scaledFloorDouble(x, 6)
    assert(got._1 == 10L && got._2 == fl6(0.8) && got._3 == fl6(0.58))
    assert(got._4.contains(fl6((0.8 - 0.58) / (1.0 - 0.58))))
    // both raters constant and equal: pe = 1 -> kappa undefined (null)
    val const = Profiler.cohenKappa(
      Seq.fill(5)(("y", "y")).toDF("a", "b"), "a", "b")
      .as[(Long, Double, Double, Option[Double])].head()
    assert(const._2 == 1.0 && const._3 == 1.0 && const._4.isEmpty)
    // null ratings are excluded, not a class
    val withNulls = Profiler.cohenKappa(
      (rows.map { case (x, y) => (Option(x), Option(y)) } :+
        ((Option.empty[String], Option("y")))).toDF("a", "b"), "a", "b")
      .as[(Long, Double, Double, Option[Double])].head()
    assert(withNulls._1 == 10L && withNulls._2 == got._2)
  }

  test("profileDrift: added/removed/common statuses, the null-rate spike, the cardinality ratio") {
    import spark.implicits._
    val oldV = (1 to 100).map(i => (i.toLong, s"v${i % 10}")).toDF("id", "a")
      .withColumn("z", lit("z0"))
    val newV = (1 to 100).map(i =>
      (i.toLong, if (i % 4 == 0) None else Some(s"v${i % 20}"))).toDF("id", "b")
      .select(col("id"), col("b").as("a"), lit("x").as("c"))
    val got = Profiler.profileDrift(oldV, newV, Seq("id", "a", "z"), Seq("id", "a", "c"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("c").getString(1) == "added" && got("id").getString(1) == "common" &&
      got("z").getString(1) == "removed")
    assert(got.size == 4)
    // the null spike: old a never null, new a null every 4th
    val aRow = got("a")
    assert(aRow.getDouble(4) == graft.functions.Quantize.scaledFloorDouble(25.0 / 100.0, 6))
    // distinct ratio > 1 (10 -> 15 surviving distinct values), present only for common
    assert(!aRow.isNullAt(5) && aRow.getDouble(5) > 1.0)
    assert(got("c").isNullAt(5))
  }

  test("ksTest: hand-computed ECDF gap with overlap; identical samples score D=0, p=1") {
    import spark.implicits._
    // A={1,2,3,4}, B={3,4,5,6}: cum gaps x4 peak at 8 -> D = 8/16 = 0.5,
    // ks = sqrt(16/8)*0.5 = sqrt(2)/2, p = 2*exp(-1)
    val a = Seq(1, 2, 3, 4).toDF("v")
    val b = Seq(3, 4, 5, 6).toDF("v")
    val got = Profiler.ksTest(a, b, "v")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(got._1 == 4L && got._2 == 4L)
    assert(got._3 == 0.5)
    assert(math.abs(got._4 - math.sqrt(2.0) / 2.0) < 2e-6)
    assert(math.abs(got._5 - 2.0 * math.exp(-1.0)) < 2e-6)
    val same = Profiler.ksTest(a, a, "v").as[(Long, Long, Double, Double, Double)].head()
    assert(same._3 == 0.0 && same._4 == 0.0 && same._5 == 1.0)
  }

  test("krippendorffAlpha: chance-level 0, perfect 1, single-rating units excluded, degenerate null") {
    import spark.implicits._
    // u1 (x,x) agrees, u2 (x,y) disagrees, u3 single-rated (excluded):
    // Do = 0.5, De = (16-10)/12 = 0.5 -> alpha = 0 (chance level)
    val chance = Seq(("u1", "a", "x"), ("u1", "b", "x"),
      ("u2", "a", "x"), ("u2", "b", "y"), ("u3", "a", "x"))
      .toDF("unit", "rater", "value")
    val c = Profiler.krippendorffAlpha(chance, "unit", "rater", "value")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(c._1 == 2L && c._2 == 4L)
    assert(c._3 == 0.5 && c._4 == 0.5 && c._5.contains(0.0))
    // perfect agreement across distinct values: Do = 0 -> alpha = 1
    val perfect = Seq(("u1", "a", "x"), ("u1", "b", "x"),
      ("u2", "a", "y"), ("u2", "b", "y")).toDF("unit", "rater", "value")
    val p = Profiler.krippendorffAlpha(perfect, "unit", "rater", "value")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(p._3 == 0.0 && p._5.contains(1.0))
    // every pairable rating identical: De = 0 -> alpha undefined (null)
    val flat = Seq(("u1", "a", "x"), ("u1", "b", "x")).toDF("unit", "rater", "value")
    val f = Profiler.krippendorffAlpha(flat, "unit", "rater", "value")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(f._5.isEmpty)
    // 3-rater missing-data case, hand-computed: u1 (x,x,x) m=3 dis 0;
    // u2 (x,y) m=2 dis 2/1 -> Do = 2/5; marg x=4 y=1, De = (25-17)/20 = 0.4
    // -> alpha = 1 - (0.4/0.4) = 0
    val mixed = Seq(("u1", "a", "x"), ("u1", "b", "x"), ("u1", "c", "x"),
      ("u2", "a", "x"), ("u2", "b", "y")).toDF("unit", "rater", "value")
    val m = Profiler.krippendorffAlpha(mixed, "unit", "rater", "value")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(m._2 == 5L && m._3 == 0.4 && m._4 == 0.4 && m._5.contains(0.0))
  }

  test("heavyHitters: exact phi-frequent set with exact counts; boundary count excluded; guards") {
    import spark.implicits._
    // n = 120: hot x50, warm x30, 40 distinct singles; phi = 1/4 -> only
    // hot (warm sits exactly AT n/4, the strict > excludes it)
    val items = (Seq.fill(50)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 40).map(i => s"one$i")).toDF("item")
    val got = Profiler.heavyHitters(items, "item", phiDen = 4)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("hot", 50L,
      graft.functions.Quantize.scaledFloorDouble(50.0 / 120.0, 6))))
    // a wider phi admits warm with its EXACT count (not the MG lower bound)
    val wide = Profiler.heavyHitters(items, "item", phiDen = 5)
      .as[(String, Long, Double)].collect().toSeq
    assert(wide.map(r => (r._1, r._2)) == Seq(("hot", 50L), ("warm", 30L)))
    intercept[IllegalArgumentException] {
      Profiler.heavyHitters(items, "item", phiDen = 1)
    }
    intercept[IllegalArgumentException] {
      Profiler.heavyHitters(items, "item", phiDen = 10, summaryK = 5)
    }
  }

  test("rocAuc: perfect separation 1, hand-computed tie case 0.875, one-class null") {
    import spark.implicits._
    val perfect = Seq((3, true), (4, true), (1, false), (2, false)).toDF("s", "y")
    val p = Profiler.rocAuc(perfect, "s", "y")
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(p == ((2L, 2L, Some(1.0), Some(1.0))))
    // pos {2,3}, neg {1,2}: pairs (2>1) + (2=2 tie 0.5) + (3>1) + (3>2)
    // -> 3.5/4 = 0.875, gini 0.75
    val tied = Seq((2, true), (3, true), (1, false), (2, false)).toDF("s", "y")
    val t = Profiler.rocAuc(tied, "s", "y")
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(t == ((2L, 2L, Some(0.875), Some(0.75))))
    val oneClass = Seq((1, true), (2, true)).toDF("s", "y")
    val o = Profiler.rocAuc(oneClass, "s", "y")
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(o._3.isEmpty && o._4.isEmpty)
  }

  test("mutualInformation: perfect dependence gives ln2/NMI 1/V 1 (zero cells corrected); independence ~0") {
    import spark.implicits._
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b")).toDF("x", "y")
    val d = Profiler.mutualInformation(dep, "x", "y")
      .as[(Long, Long, Long, Double, Option[Double], Option[Double])].head()
    assert(d._1 == 4L && d._2 == 2L && d._3 == 2L)
    assert(d._4 == 0.693147) // ln 2 on the grid
    assert(d._5.contains(1.0))
    // the zero-cell correction: chi2 = 2 observed + 2 missing = 4 -> V = 1
    // (without it V = sqrt(2/4) = 0.707)
    assert(d._6.contains(1.0))
    // exact independence: every cell at its expected count
    val ind = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v")).toDF("x", "y")
    val i = Profiler.mutualInformation(ind, "x", "y")
      .as[(Long, Long, Long, Double, Option[Double], Option[Double])].head()
    assert(i._4 == 0.0 && i._5.contains(0.0) && i._6.contains(0.0))
    // a constant column carries no information: NMI and V null
    val const = Seq(("a", "u"), ("a", "v")).toDF("x", "y")
    val c = Profiler.mutualInformation(const, "x", "y")
      .as[(Long, Long, Long, Double, Option[Double], Option[Double])].head()
    assert(c._4 == 0.0 && c._5.isEmpty && c._6.isEmpty)
  }

  test("bootstrapMeanCi: constant column collapses the CI to the mean; spread column brackets it") {
    import spark.implicits._
    val const = (1L to 100L).map(i => (i, 7L)).toDF("id", "v")
    val c = Profiler.bootstrapMeanCi(const, "id", "v", reps = 50, salt = "t1")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(c == ((100L, 50L, 7.0, 7.0, 7.0)))
    val spread = (0L until 1000L).map(i => (i, i)).toDF("id", "v")
    val s = Profiler.bootstrapMeanCi(spread, "id", "v", reps = 200, salt = "t2")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(s._1 == 1000L && s._2 == 200L)
    assert(s._3 == 499.5)
    // sd ~288.7 -> se ~9.1 -> 95% CI roughly +-18; assert a loose band
    assert(s._4 < s._3 && s._3 < s._5, s"CI (${s._4}, ${s._5}) must bracket ${s._3}")
    assert(s._3 - s._4 < 60.0 && s._5 - s._3 < 60.0)
    // float columns are refused (order-sensitive sums)
    intercept[IllegalArgumentException] {
      Profiler.bootstrapMeanCi(
        Seq((1L, 1.5)).toDF("id", "v"), "id", "v", reps = 50, salt = "t3")
    }
  }

  test("brierDecomposition: perfect predictions decompose to brier 0 = rel 0 - res .25 + unc .25") {
    val perfect = Seq((1.0, true), (1.0, true), (0.0, false), (0.0, false))
      .toDF("p", "y")
    val r = Profiler.brierDecomposition(perfect, "p", "y", bins = 10).collect().head
    assert(r.getLong(0) == 4L && r.getDouble(1) == 0.5)
    assert(r.getDouble(2) == 0.0) // brier
    assert(r.getDouble(3) == 0.0) // reliability
    assert(r.getDouble(4) == 0.25) // resolution
    assert(r.getDouble(5) == 0.25) // uncertainty
  }

  test("brierDecomposition: a single overconfident prediction is pure reliability penalty") {
    // p=0.8, y=0: brier = rel = 0.64, res = 0, unc = 0 (base rate 0)
    val df = Seq((0.8, false)).toDF("p", "y")
    val r = Profiler.brierDecomposition(df, "p", "y", bins = 10).collect().head
    assert(r.getDouble(2) == 0.64 && r.getDouble(3) == 0.64)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
    intercept[IllegalArgumentException](
      Profiler.brierDecomposition(df, "p", "y", bins = 1))
  }

  test("isotonicCalibration: PAV pools the decreasing violation, leaves monotone input alone") {
    // bins (0,1,2) of 4: rates [0.6, 0.2, 0.8] -> PAV pools bins 0-1 at
    // (3+1)/(5+5) = 0.4, keeps 0.8
    def mk(bin0: Int, bin1: Int, bin2: Int) = {
      def rows(score: Double, pos: Int, n: Int) =
        (0 until n).map(i => (score, i < pos))
      (rows(0.1, bin0, 5) ++ rows(0.3, bin1, 5) ++ rows(0.55, bin2, 5)).toDF("p", "y")
    }
    val pooled = Profiler.isotonicCalibration(mk(3, 1, 4), "p", "y", bins = 4)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(pooled.map(_._3).toSeq == Seq(0.6, 0.2, 0.8))
    assert(pooled.map(_._4).toSeq == Seq(0.4, 0.4, 0.8))
    val mono = Profiler.isotonicCalibration(mk(1, 2, 4), "p", "y", bins = 4)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(mono.map(_._4).toSeq == mono.map(_._3).toSeq)
    intercept[IllegalArgumentException](
      Profiler.isotonicCalibration(mk(1, 2, 3), "p", "y", bins = 1000))
  }

  test("comomentPartial/comomentMerge: merged shards reproduce pearsonByGroup bit-exactly") {
    val rows = Seq(("g1", 1.25, 2.50), ("g1", 2.10, 4.30), ("g1", 3.33, 5.01),
      ("g2", 1.00, 9.99), ("g2", 2.00, 7.77), ("g2", 3.00, 5.55), ("g1", 0.40, 1.80))
    val df = rows.toDF("g", "x", "y")
    val scratch = Profiler.pearsonByGroup(df, Seq("g"), "x", "y")
      .orderBy("g").collect().toSeq
    val parts = Seq(rows.take(3), rows.slice(3, 5), rows.drop(5))
      .map(s => Profiler.comomentPartial(s.toDF("g", "x", "y"), Seq("g"), "x", "y"))
    val merged = Profiler.comomentMerge(parts, Seq("g"))
    val viaMerge = Profiler.pearsonFromComoments(merged, Seq("g"))
      .orderBy("g").collect().toSeq
    assert(viaMerge == scratch)
    assert(merged.orderBy("g").collect().toSeq ==
      Profiler.comomentPartial(df, Seq("g"), "x", "y").orderBy("g").collect().toSeq)
    intercept[IllegalArgumentException](Profiler.comomentMerge(Nil, Seq("g")))
  }

  test("oosCalibratedBrier: the overfit PAV map improves in-sample but regresses held-out") {
    // Train: one row per bin, rates 0/1 — the PAV map memorizes the noise
    // (iso(bin4)=0, iso(bin5)=1). In-sample (held-out = a copy of train)
    // that map is perfect; on a held-out half whose labels flipped it is
    // maximally wrong — the split is what exposes the overfit.
    val train = Seq(("train", 0.45, false), ("train", 0.55, true))
    val inSample = (train ++ train.map { case (_, p, y) => ("test", p, y) })
      .toDF("split", "p", "y")
    val ins = Profiler.oosCalibratedBrier(inSample, "split", "train", "p", "y", 10)
      .as[(Long, Long, Double, Double)].collect().head
    assert(ins == ((2L, 2L, 0.2025, 0.0))) // calibration helps in-sample
    // held-out: flipped labels in the mapped bins + one bin-9 row the
    // train map never saw (identity fallback: cal term == raw term)
    val flipped = (train ++ Seq(("test", 0.45, true), ("test", 0.55, false),
      ("test", 0.95, true))).toDF("split", "p", "y")
    val oos = Profiler.oosCalibratedBrier(flipped, "split", "train", "p", "y", 10)
      .as[(Long, Long, Double, Double)].collect().head
    assert(oos._1 == 2L && oos._2 == 3L)
    assert(oos._3 == 0.2025) // raw: (.3025 + .3025 + .0025)/3
    assert(oos._4 == 0.6675) // calibrated: (1 + 1 + .0025)/3 — REGRESSES
    assert(oos._4 > oos._3)
    // no train rows: the map is empty, every bin falls back to identity
    val noTrain = Seq(("test", 0.45, true), ("test", 0.55, false))
      .toDF("split", "p", "y")
    val id = Profiler.oosCalibratedBrier(noTrain, "split", "train", "p", "y", 10)
      .as[(Long, Long, Double, Double)].collect().head
    assert(id._1 == 0L && id._3 == id._4)
    // no held-out rows: empty frame (the brierDecomposition convention)
    val noTest = Seq(("train", 0.45, true)).toDF("split", "p", "y")
    assert(Profiler.oosCalibratedBrier(noTest, "split", "train", "p", "y", 10).isEmpty)
  }

  test("expectationReport: bounds enforced, all-null column fails closed, bad kind rejects") {
    val df = Seq((1L, "en", Some(10.0)), (2L, "en", Some(20.0)), (3L, "de", None))
      .toDF("id", "lang", "v")
    val rows = Profiler.expectationReport(df, Seq(
      ("id", "distinct_ge", 3.0),
      ("id", "distinct_le", 2.0),       // violated: 3 distinct
      ("v", "min_ge", 15.0),            // violated: min 10
      ("v", "max_le", 20.0),
      ("v", "null_frac_le", 0.5),       // 1/3 nulls -> pass
      ("lang", "null_frac_le", 0.0)))
      .orderBy(col("col_name"), col("kind"), col("bound")).collect()
    val byKey = rows.map(r => (r.getString(0), r.getString(1), r.getDouble(2)) ->
      ((Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))).toMap
    assert(byKey(("id", "distinct_ge", 3.0)) == ((Some(3.0), true)))
    assert(byKey(("id", "distinct_le", 2.0)) == ((Some(3.0), false)))
    assert(byKey(("v", "min_ge", 15.0)) == ((Some(10.0), false)))
    assert(byKey(("v", "max_le", 20.0)) == ((Some(20.0), true)))
    assert(byKey(("v", "null_frac_le", 0.5))._2)
    assert(byKey(("v", "null_frac_le", 0.5))._1.exists(o => math.abs(o - 0.333333) < 1e-9))
    assert(byKey(("lang", "null_frac_le", 0.0)) == ((Some(0.0), true)))

    // an all-null numeric column cannot certify a range bound: fail closed
    val nulls = Seq((1L, None: Option[Double]), (2L, None)).toDF("id", "v")
    val r = Profiler.expectationReport(nulls, Seq(("v", "min_ge", 0.0))).collect().head
    assert(r.isNullAt(3) && !r.getBoolean(4))

    intercept[IllegalArgumentException](
      Profiler.expectationReport(df, Seq(("v", "between", 1.0))))
    intercept[IllegalArgumentException](
      Profiler.expectationReport(df, Seq(("nope", "min_ge", 1.0))))
  }

  test("hillTailIndex: recovers a planted Pareto exponent, degenerate tail nulls alpha, loud underflow, O(k) plan") {
    // exact inverse-CDF grid of Pareto(alpha=2): X = u^(-1/2), u = i/n
    val n = 5000
    val pareto = (1 to n).map(i => math.pow(i.toDouble / n, -0.5)).toDF("x")
    val r = Profiler.hillTailIndex(pareto, "x", k = 100).collect().head
    assert(r.getLong(0) == 100L)
    val hill = r.getDouble(2); val alpha = r.getDouble(3)
    assert(math.abs(hill - 0.5) < 0.1, s"hill $hill should estimate 1/alpha = 0.5")
    assert(math.abs(alpha - 2.0) < 0.4, s"alpha $alpha should estimate 2")
    // constant tail: every ln-ratio is 0 -> hill 0 -> alpha null
    val const = Seq.fill(50)(7.0).toDF("x")
    val c = Profiler.hillTailIndex(const, "x", k = 10).collect().head
    assert(c.getDouble(2) == 0.0 && c.isNullAt(3))
    // fewer than k+1 positive values must fail loudly, not mis-estimate
    val few = (Seq.fill(5)(3.0) ++ Seq(-1.0, 0.0)).toDF("x")
    val e = intercept[Exception](Profiler.hillTailIndex(few, "x", k = 10).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("need 11 positive values")))
    // scale shape: the top-k select plans as TakeOrdered, not a global sort
    val plan = Profiler.hillTailIndex(pareto, "x", k = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered in:\n$plan")
  }
}
